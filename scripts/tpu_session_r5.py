"""One long-lived TPU session for round-5 chip work.

Same rationale as tpu_session_r{3,4}.py: the axon tunnel charges minutes of
device-claim latency per process and a killed client can wedge the claim, so
chip tasks run sequentially in one process.  Round-5 stages (select with
NDJIR_SESSION_STAGES=...):

  probe2      — probe_grid_bwd variants that need CURRENT code (the
                one-pass fold default): gather_vjp_onepass, block_base,
                block_master, plus any variants session 1 left unmeasured.
  ab          — single-mode headline bench at current code (quick signal
                before committing to the full suite).
  suite       — the full bench suite (merges into BENCH_MODES.json) +
                3x headline repeats into docs/headline_runs.json.
  quality_v2  — eval-only re-score of the committed round-4 v2 checkpoint
                (ssim_obj via the fixed mask-weighted SSIM; VERDICT item 4).
  quality_v1  — fresh v1-scene training at current code (reduced epochs),
                the hard-generalization counterpart.
  merge_quality — fold the two scene results into QUALITY_r05.json with
                explicit pass bars.
  roofline    — refresh cost_analysis (cleaned schema) at current code.

Each stage is independent (try/except) and flushes artifacts before the
next starts.
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


def stage_probe2():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import probe_grid_bwd as pg

    sys.argv = ["probe_grid_bwd", "gather_vjp_onepass", "scatter_d32_argsort",
                "build_octa_packed", "gather_packed", "octa_packed_fwd",
                "gather_vjp_packed", "zdup512_fwd", "zdup512_packed_fwd",
                "block_base", "block_master"] + os.environ.get(
                    "NDJIR_SESSION_PROBE_EXTRA", "").split()
    sys.argv = [a for a in sys.argv if a]
    pg.main()


def stage_ab():
    import runpy

    os.environ["NDJIR_BENCH_SUITE"] = "0"
    os.environ["NDJIR_BENCH_SPC"] = "8"
    try:
        mod = runpy.run_path(os.path.join(REPO, "bench.py"))
        r = mod["time_one"](mod["build_conf"](), (1, 1), spc=8)
        print(json.dumps({"ab_headline_spc8": round(r, 1)}), flush=True)
    finally:
        os.environ.pop("NDJIR_BENCH_SUITE", None)
        os.environ.pop("NDJIR_BENCH_SPC", None)


def stage_suite():
    import runpy

    import numpy as np

    os.environ["NDJIR_BENCH_BUDGET_S"] = os.environ.get(
        "NDJIR_SESSION_SUITE_BUDGET", "10800")
    mod = runpy.run_path(os.path.join(REPO, "bench.py"))
    modes = mod["run_suite"]()
    print(json.dumps({"suite": {k: v for k, v in modes.items()}}),
          flush=True)

    # 3x headline repeats for the README mean +- spread (compile cached now)
    vals = []
    for i in range(3):
        r = mod["time_one"](mod["build_conf"](spc=None), (1, 1), spc=8)
        vals.append(round(r, 1))
        print(f"[headline] run {i}: {r:.1f} rays/s", flush=True)
    out = {"runs": vals, "mean": round(float(np.mean(vals)), 1),
           "spread": round(float(np.max(vals) - np.min(vals)), 1),
           "config": "g256 production (bf16 MLP + bf16 grid, concat-chain "
                     "dup-table + optimization_barrier, one-pass fold, "
                     "steps_per_call=8)",
           "date": time.strftime("%Y-%m-%d")}
    with open(os.path.join(REPO, "docs", "headline_runs.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"[headline] {out}", flush=True)


def stage_quality_v2():
    """Eval-only rescore of the round-4 v2 checkpoint (1500 epochs)."""
    env = {
        "NDJIR_QUALITY_EPOCHS": "1500",
        "NDJIR_QUALITY_GRID": "256",
        "NDJIR_QUALITY_RES": "128",
        "NDJIR_QUALITY_VIEWS": "24",
        "NDJIR_QUALITY_SCENE": "v2",
        "NDJIR_QUALITY_WORKDIR": "/tmp/ndjir_quality_r4_v2",
        "NDJIR_QUALITY_RESUME": "1",
        "NDJIR_QUALITY_OUT": "/tmp/quality_r5_v2.json",
    }
    import runpy
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        runpy.run_path(os.path.join(REPO, "scripts", "quality_benchmark.py"),
                       run_name="__main__")
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def stage_quality_v1():
    """Fresh v1-scene training at current code: the hard-generalization
    counterpart (v1 shades with a model OUTSIDE the forward family)."""
    env = {
        "NDJIR_QUALITY_EPOCHS": os.environ.get(
            "NDJIR_SESSION_V1_EPOCHS", "1500"),
        "NDJIR_QUALITY_GRID": "256",
        "NDJIR_QUALITY_RES": "128",
        "NDJIR_QUALITY_VIEWS": "24",
        "NDJIR_QUALITY_SCENE": "v1",
        "NDJIR_QUALITY_WORKDIR": "/tmp/ndjir_quality_r5_v1",
        "NDJIR_QUALITY_OUT": "/tmp/quality_r5_v1.json",
    }
    import runpy
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        runpy.run_path(os.path.join(REPO, "scripts", "quality_benchmark.py"),
                       run_name="__main__")
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def stage_merge_quality():
    out = {}
    for key, path in (("v2", "/tmp/quality_r5_v2.json"),
                      ("v1", "/tmp/quality_r5_v1.json")):
        if os.path.exists(path):
            with open(path) as f:
                out[key] = json.load(f)
    # Pass bars (VERDICT r4 item 4): v2 is exactly-representable (up to MC
    # noise + capacity), so the framework should reconstruct it well; v1
    # includes deliberate model mismatch, so only geometry carries a bar.
    bars = {
        "v2_psnr_masked_min": 32.0,
        "v2_ssim_obj_min": 0.85,
        "v1_chamfer_max": 0.01,
    }
    verdicts = {}
    if "v2" in out:
        verdicts["v2_psnr_ok"] = out["v2"].get("psnr_masked", 0) >= \
            bars["v2_psnr_masked_min"]
        verdicts["v2_ssim_obj_ok"] = out["v2"].get("ssim_obj", 0) >= \
            bars["v2_ssim_obj_min"]
    if "v1" in out:
        verdicts["v1_chamfer_ok"] = out["v1"].get("chamfer", 1) <= \
            bars["v1_chamfer_max"]
    out["pass_bars"] = bars
    out["verdicts"] = verdicts
    with open(os.path.join(REPO, "QUALITY_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


def stage_roofline():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import roofline_data as rd

    # re-measure sections whose program changed (one-pass fold)
    if os.path.exists(rd.OUT_PATH):
        with open(rd.OUT_PATH) as f:
            data = json.load(f)
        data.pop("cost_analysis", None)
        with open(rd.OUT_PATH, "w") as f:
            json.dump(data, f, indent=1)
    try:
        rd.SECTIONS["cost_analysis"]()
    except Exception:
        traceback.print_exc()
        print("[roofline] cost_analysis FAILED (continuing)", flush=True)


STAGES = {
    "probe2": stage_probe2,
    "ab": stage_ab,
    "suite": stage_suite,
    "quality_v2": stage_quality_v2,
    "quality_v1": stage_quality_v1,
    "merge_quality": stage_merge_quality,
    "roofline": stage_roofline,
}

if __name__ == "__main__":
    names = os.environ.get(
        "NDJIR_SESSION_STAGES",
        "probe2,ab,quality_v2,quality_v1,merge_quality,suite,roofline"
    ).split(",")
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
