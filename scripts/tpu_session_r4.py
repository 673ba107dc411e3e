"""One long-lived TPU session for all round-4 chip work.

Same rationale as tpu_session_r3.py: the axon tunnel charges minutes of
device-claim latency per process and a killed client can wedge the claim, so
every chip task runs sequentially in THIS process.  Round-4 stages:

  1. suite    — the full five-mode bench suite (fresh compiles of the concat-chain
                dup-table + optimization_barrier build) with a large budget, refreshing
                BENCH_MODES.json + headline_runs.json (3x headline runs).
  2. quality  — QUALITY_r04 benchmark on the v2 scene (framework-native
                image formation), 1500 epochs, 128^2 x 24 views, grid 256.
  3. roofline — roofline evidence sections affected by the dup-table build
                (cost_analysis + ablation; gather/scatter/sort rates are
                microbenches of unchanged kernels).  Runs LAST: every
                ablation variant is a fresh 10-30 min remote compile.

Each stage is independent (try/except) and flushes its artifact before the
next starts.  Select with NDJIR_SESSION_STAGES=suite,roofline,quality.
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


def stage_suite():
    import runpy

    import numpy as np

    os.environ["NDJIR_BENCH_BUDGET_S"] = os.environ.get(
        "NDJIR_SESSION_SUITE_BUDGET", "3600")
    mod = runpy.run_path(os.path.join(REPO, "bench.py"))
    modes = mod["run_suite"]()
    print(json.dumps({"suite": modes}), flush=True)

    # 3x headline repeats for the README mean +- spread (compile cached now)
    vals = []
    for i in range(3):
        r = mod["time_one"](mod["build_conf"](), (1, 1))
        vals.append(round(r, 1))
        print(f"[headline] run {i}: {r:.1f} rays/s", flush=True)
    out = {"runs": vals, "mean": round(float(np.mean(vals)), 1),
           "spread": round(float(np.max(vals) - np.min(vals)), 1),
           "config": "g256 production (bf16 MLP + bf16 grid, concat-chain dup-table + optimization_barrier)",
           "date": "2026-08-20"}
    with open(os.path.join(REPO, "docs", "headline_runs.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"[headline] {out}", flush=True)


def stage_roofline():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import roofline_data as rd

    # the concat-chain dup-table build changes the step program: drop the stale
    # sections so their resume logic re-measures instead of skipping
    if os.path.exists(rd.OUT_PATH):
        with open(rd.OUT_PATH) as f:
            data = json.load(f)
        for k in ("cost_analysis", "ablation_g256_bf16"):
            data.pop(k, None)
        with open(rd.OUT_PATH, "w") as f:
            json.dump(data, f, indent=1)
    for name in ("cost_analysis", "ablation"):
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
    os.environ.setdefault("NDJIR_QUALITY_SCENE", "v2")
    import runpy
    runpy.run_path(os.path.join(REPO, "scripts", "quality_benchmark.py"),
                   run_name="__main__")


STAGES = {
    "suite": stage_suite,
    "roofline": stage_roofline,
    "quality": stage_quality,
}

if __name__ == "__main__":
    names = os.environ.get("NDJIR_SESSION_STAGES",
                           "suite,quality,roofline").split(",")
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
