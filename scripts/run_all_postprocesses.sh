#!/usr/bin/env bash
# Full postprocess pipeline: extracted attribute meshes -> DCC-ready assets.
# Parity with reference scripts/run_all_postprocesses.sh:16-38
# (smooth -> rebake implicit illumination -> texture bake).
#
# Usage: run_all_postprocesses.sh <base_color_mesh.obj> <implicit_illum_mesh.obj>
set -euo pipefail

BASE=${1:?base color mesh}
ILLUM=${2:?implicit illumination mesh}
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

python -m ndjir_tpu.tools.mesh_post smooth "$BASE" --iters 2
SMOOTHED="${BASE%.obj}_smoothed.obj"
python -m ndjir_tpu.tools.mesh_post rebake -f0 "$SMOOTHED" -f1 "$ILLUM"
python -m ndjir_tpu.tools.mesh_post bake "${SMOOTHED%.obj}_ilbaked.obj"
echo "Postprocess complete"
