"""Profiling helpers: xprof traces + wall-time decorator.

The reference has only a wall-time decorator (reference: helper.py:127-134);
here `trace()` captures a full jax.profiler/xprof trace (kernel timeline,
HBM traffic, MXU utilization) viewable with tensorboard or xprof.
"""

from __future__ import annotations

import contextlib
import time
from functools import wraps

from ndjir_tpu.utils.monitor import logger


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ndjir_tpu_trace"):
    """Capture an xprof trace of the enclosed computation."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info(f"xprof trace written to {logdir}")


def annotate(name: str):
    """Named region visible in the trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def watch_etime(func):
    """Wall-time print decorator (reference: helper.py:127-134)."""
    @wraps(func)
    def wrapper(*args, **kwargs):
        st = time.perf_counter()
        ret = func(*args, **kwargs)
        logger.info(f"Elapsed time ({func.__name__}) = "
                    f"{time.perf_counter() - st:.3f} s")
        return ret
    return wrapper
