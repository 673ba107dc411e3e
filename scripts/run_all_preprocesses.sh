#!/usr/bin/env bash
# Full preprocess pipeline: video -> IDR-format training scene.
# Parity with reference scripts/run_all_preprocesses.sh:16-72
# (extract -> deblur -> mask -> COLMAP -> npz convert -> normalize).
#
# Usage: run_all_preprocesses.sh <video_path> <scene_dir> [n_frames]
set -euo pipefail

VIDEO=${1:?video path}
SCENE=${2:?scene output dir}
N_FRAMES=${3:-100}
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

mkdir -p "$SCENE"
python -m ndjir_tpu.tools.images extract "$VIDEO" "$SCENE/image_raw" --num-frames "$N_FRAMES"
python -m ndjir_tpu.tools.images deblur "$SCENE/image_raw" "$SCENE/image"
python -m ndjir_tpu.tools.images masks "$SCENE/image" "$SCENE/mask"

if command -v colmap >/dev/null; then
  colmap automatic_reconstructor \
      --workspace_path "$SCENE" --image_path "$SCENE/image" \
      --camera_model SIMPLE_RADIAL --sparse 1 --dense 0
  colmap model_converter \
      --input_path "$SCENE/sparse/0" --output_path "$SCENE/sparse/0" \
      --output_type TXT
else
  echo "WARNING: colmap binary not found; provide $SCENE/sparse/0/{cameras,images}.txt yourself" >&2
fi

python -m ndjir_tpu.tools.colmap -i "$SCENE"
python -m ndjir_tpu.tools.normalize_cameras --source_dir "$SCENE" --replace
echo "Scene ready: $SCENE"
