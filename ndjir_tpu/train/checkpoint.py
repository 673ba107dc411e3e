"""Full-state checkpointing (params + optimizer + schedule position).

Exceeds the reference, which saves parameters only and cannot resume
(reference: train.py:100-101, SURVEY.md section 5 "save-only").  Format is a
single msgpack file via flax.serialization with a sidecar JSON manifest;
checkpoints are atomic (tmp + rename) and pruned to ``keep_checkpoints``.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, step: int, params, opt_state=None,
                    extra: Optional[Dict[str, Any]] = None,
                    keep: int = 3) -> str:
    fpath = os.path.join(path, f"ckpt_{step:07d}.msgpack")
    # multi-host: params are replicated, so only process 0 writes (a shared
    # monitor path would otherwise see N concurrent writers on one file)
    if jax.process_index() != 0:
        return fpath
    os.makedirs(path, exist_ok=True)
    state = {"params": jax.device_get(params)}
    if opt_state is not None:
        state["opt_state"] = jax.device_get(opt_state)
    blob = serialization.to_bytes(state)
    tmp = fpath + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, fpath)
    manifest = {"step": step, "file": os.path.basename(fpath),
                "extra": extra or {}}
    with open(os.path.join(path, f"ckpt_{step:07d}.json"), "w") as f:
        json.dump(manifest, f)

    ckpts = sorted(glob.glob(os.path.join(path, "ckpt_*.msgpack")))
    for old in ckpts[:-keep] if keep > 0 else []:
        os.remove(old)
        meta = old.replace(".msgpack", ".json")
        if os.path.exists(meta):
            os.remove(meta)
    return fpath


def latest_checkpoint(path: str) -> Optional[str]:
    ckpts = sorted(glob.glob(os.path.join(path, "ckpt_*.msgpack")))
    return ckpts[-1] if ckpts else None


def load_checkpoint(fpath: str, params_template, opt_state_template=None
                    ) -> Tuple[Any, Any, Dict[str, Any]]:
    """Restore (params, opt_state, manifest-extra) onto templates."""
    with open(fpath, "rb") as f:
        blob = f.read()
    target = {"params": params_template}
    if opt_state_template is not None:
        target["opt_state"] = opt_state_template
    state = serialization.from_bytes(target, blob)
    meta_path = fpath.replace(".msgpack", ".json")
    extra = {}
    step = 0
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            m = json.load(f)
        step = m.get("step", 0)
        extra = m.get("extra", {})
    extra["step"] = step
    return state["params"], state.get("opt_state"), extra
