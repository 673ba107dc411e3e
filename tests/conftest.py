"""Test harness: force an 8-device virtual CPU mesh (no TPU needed).

The axon TPU-tunnel plugin (registered by a sitecustomize hook in every
python process) blocks for up to ~3 min claiming the remote chip the first
time any jax backend initializes — even under JAX_PLATFORMS=cpu.  Tests run
pure-CPU, so the factory is deregistered here before jax's first use; CPU
test startup drops from minutes to seconds.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

try:
    # sitecustomize already imported jax and latched JAX_PLATFORMS=axon into
    # its config, so the env var alone is not enough: update the live config
    # and drop the axon factory.
    import jax
    from jax._src import xla_bridge as _xb

    jax.config.update("jax_platforms", "cpu")
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(412)
