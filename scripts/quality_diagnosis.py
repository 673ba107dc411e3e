"""Diagnose the resolution-dependent PSNR/SSIM drop on the hard scene.

QUALITY_r02 (96^2): masked PSNR 27.7, SSIM 0.62.  QUALITY_r03 (128^2):
chamfer improved to 0.00244 but PSNR 25.7 / SSIM 0.40.  Hypothesis: the
hard scene's GT renderer (procedural texture + soft shadows + a GGX-ish
specular model that is NOT our forward model) has high-frequency content
that grows with resolution; SSIM punishes the model-mismatch residual at
the native scale, not a framework regression.

Evidence produced (docs/quality_diagnosis.json + docs/quality_diag_*.png):
  - SSIM/PSNR of the trained model's render vs GT at native 128^2 and at
    2x / 4x box-downsampled scales: if the drop is high-frequency residual,
    the downsampled scores recover toward the 96^2-era numbers.
  - The same metrics for a LOW-PASS oracle (GT blurred with the same 2x
    down/up round trip): the score a perfectly-converged model missing only
    the top octave would get — an upper bound under frequency mismatch.
  - side-by-side PNGs for visual inspection.

Run on the chip after quality_benchmark (reuses its checkpoint + scene):
  python scripts/quality_diagnosis.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ndjir_tpu.utils.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import numpy as np  # noqa: E402


def box_down(img, k):
    H, W, C = img.shape
    return img[:H - H % k, :W - W % k].reshape(
        H // k, k, W // k, k, C).mean(axis=(1, 3))


def up_nearest(img, k):
    return np.repeat(np.repeat(img, k, axis=0), k, axis=1)


def main():
    import imageio.v2 as imageio
    import jax

    from ndjir_tpu.config import load_config
    from ndjir_tpu.data.dataset import IDRDataset
    from ndjir_tpu.eval.image import psnr, ssim
    from ndjir_tpu.models.fields import init_model
    from ndjir_tpu.render.image import render_image
    from ndjir_tpu.train import schedules
    from ndjir_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    work = os.environ.get("NDJIR_QUALITY_WORKDIR", "/tmp/ndjir_quality_r4_v1")
    scene = os.path.join(work, "scene")
    grid = int(os.environ.get("NDJIR_QUALITY_GRID", "256"))
    conf = load_config("default", overrides=[
        f"data_path={scene}",
        f"monitor_base_path={work}/run",
        f"geometric_network.voxel.grid_size={grid}",
        "precision.mlp_dtype=bfloat16",
        "train.mask_weight=0.1",
        "renderer.bounding_sphere_radius=0.75",
        "valid.skip=true",
    ])
    ck = latest_checkpoint(os.path.join(work, "final_ckpt"))
    assert ck, "run scripts/quality_benchmark.py first"
    params = init_model(jax.random.PRNGKey(0), conf)
    params, _, _ = load_checkpoint(ck, params)

    ds = IDRDataset(conf, train=False)
    lvg = schedules.light_visibility_gain(conf.train.epoch - 1, conf)
    conf.valid.n_down_samples = 0
    img = render_image(params, ds.poses[0:1], ds.intrinsics[0:1],
                       (ds.W, ds.H), conf, lv_gain=lvg)
    pred = np.clip(img[0].transpose(1, 2, 0), 0, 1).astype(np.float32)
    gt = ds.images[0].astype(np.float32)
    mask = (ds.masks[0] > 0.5)
    m3 = np.repeat(mask, 3, axis=-1)

    def metrics(p, g, m):
        ps = float(psnr(p[None].transpose(0, 3, 1, 2),
                        g[None].transpose(0, 3, 1, 2),
                        mask=m[None].transpose(0, 3, 1, 2)))
        return {"psnr_masked": round(ps, 3), "ssim": round(float(ssim(p, g)), 4)}

    out = {"checkpoint": ck, "view": 0, "res": int(ds.W)}
    out["native"] = metrics(pred, gt, m3)
    for k in (2, 4):
        pd, gd = box_down(pred, k), box_down(gt, k)
        md = box_down(m3.astype(np.float32), k) > 0.5
        out[f"down{k}x"] = metrics(pd, gd, md)
    # low-pass oracle: GT that lost its top octave, scored at native scale
    gt_lp = up_nearest(box_down(gt, 2), 2)[:gt.shape[0], :gt.shape[1]]
    out["lowpass_gt_oracle_native"] = metrics(gt_lp, gt, m3)

    imageio.imwrite(os.path.join(REPO, "docs", "quality_diag_pred.png"),
                    (pred * 255).astype(np.uint8))
    imageio.imwrite(os.path.join(REPO, "docs", "quality_diag_gt.png"),
                    (gt * 255).astype(np.uint8))
    with open(os.path.join(REPO, "docs", "quality_diagnosis.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
