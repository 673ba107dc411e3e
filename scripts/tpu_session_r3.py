"""One long-lived TPU session for all round-3 chip work.

The axon tunnel charges minutes of device-claim latency per process (and a
killed client wedges the claim for the next one), so every chip task runs
sequentially in THIS process:

  1. render_image drive (verifies the canonical-chunk-conf change on chip)
  2. 3x G=256 production headline timings (README mean +- spread)
  3. roofline evidence sections (gathers/scatter/sort/cost_analysis/ablation)
  4. QUALITY_r03 benchmark (128^2 x 24 views, grid 256, 1500 epochs)

Each stage is independent (try/except) and flushes its artifact before the
next starts.  Stages: NDJIR_SESSION_STAGES=render,headline,roofline,quality
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ndjir_tpu.utils.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()


def stage_render():
    import jax
    import numpy as np

    from ndjir_tpu.config import load_config
    from ndjir_tpu.models.fields import init_model
    from ndjir_tpu.render.image import _render_chunk, render_image

    conf = load_config("default", overrides=[
        "geometric_network.voxel.grid_size=64",
        "precision.mlp_dtype=bfloat16",
        "precision.grid_dtype=bfloat16",
        "valid.n_rays=512",
        "valid.n_down_samples=1",
    ])
    params = init_model(jax.random.PRNGKey(0), conf)
    H = W = 64
    f = 1.2 * W
    intrinsic = np.array([[[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]]],
                         np.float32)
    pose = np.eye(4, dtype=np.float32)[None]
    pose[0, :3, 3] = [0.0, 0.0, 2.5]
    pose[0, :3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                               np.float32)
    img = render_image(params, pose, intrinsic, (W, H), conf, lv_gain=1.0)
    n0 = _render_chunk._cache_size()
    # unread-field edit must not recompile on the chip either
    from ndjir_tpu.config import Config
    d = conf.to_dict()
    d["valid"]["n_down_samples"] = 0
    d["extraction"] = {"grid_size": 5}
    img2 = render_image(params, pose, intrinsic, (W // 2, H // 2),
                        Config(d), lv_gain=1.0)
    assert _render_chunk._cache_size() == n0, "chunk recompiled!"
    print(f"[render] ok shape={img.shape} then {img2.shape}, "
          f"cache_size={n0}", flush=True)


def stage_headline(n_runs=3):
    import runpy
    mod = runpy.run_path(os.path.join(REPO, "bench.py"))
    vals = []
    for i in range(n_runs):
        r = mod["time_one"](mod["build_conf"](), (1, 1))
        vals.append(round(r, 1))
        print(f"[headline] run {i}: {r:.1f} rays/s", flush=True)
    import numpy as np
    out = {"runs": vals, "mean": round(float(np.mean(vals)), 1),
           "spread": round(float(np.max(vals) - np.min(vals)), 1),
           "config": "g256 production (bf16 MLP + bf16 grid)",
           "date": "2026-08-19"}
    with open(os.path.join(REPO, "docs", "headline_runs.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"[headline] {out}", flush=True)


def stage_roofline():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import roofline_data as rd
    for name in ("gathers", "scatter", "sort", "cost_analysis", "ablation"):
        try:
            rd.SECTIONS[name]()
        except Exception:
            traceback.print_exc()
            print(f"[roofline] section {name} FAILED (continuing)",
                  flush=True)


def stage_quality():
    os.environ.setdefault("NDJIR_QUALITY_EPOCHS", "1500")
    os.environ.setdefault("NDJIR_QUALITY_GRID", "256")
    os.environ.setdefault("NDJIR_QUALITY_RES", "128")
    os.environ.setdefault("NDJIR_QUALITY_VIEWS", "24")
    import runpy
    runpy.run_path(os.path.join(REPO, "scripts", "quality_benchmark.py"),
                   run_name="__main__")


STAGES = {
    "render": stage_render,
    "headline": stage_headline,
    "roofline": stage_roofline,
    "quality": stage_quality,
}

if __name__ == "__main__":
    names = os.environ.get("NDJIR_SESSION_STAGES",
                           "render,headline,roofline,quality").split(",")
    for n in names:
        t0 = time.time()
        print(f"=== stage {n} ===", flush=True)
        try:
            STAGES[n.strip()]()
        except Exception:
            traceback.print_exc()
            print(f"=== stage {n} FAILED ===", flush=True)
        print(f"=== stage {n} done in {time.time() - t0:.0f}s ===",
              flush=True)
