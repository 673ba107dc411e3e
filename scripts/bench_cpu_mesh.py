"""Run bench.py on the virtual CPU mesh (scaling-plumbing mode).

Deregisters the axon TPU tunnel (which otherwise claims the remote chip even
under JAX_PLATFORMS=cpu) and forwards to bench.py.  Use with:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  NDJIR_BENCH_MESH=2,4 NDJIR_BENCH_GRID=64 python scripts/bench_cpu_mesh.py
"""
import os
import runpy
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    # no supported API exists to drop an already-registered PJRT plugin
    # (the axon plugin ignores JAX_PLATFORMS once sitecustomize registered
    # it); best-effort pop of the private factory table, tolerated to fail
    # on JAX upgrades — jax_platforms=cpu above is the supported half.
    from jax._src import xla_bridge as _xb  # noqa: E402
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
runpy.run_path(os.path.join(repo, "bench.py"), run_name="__main__")
