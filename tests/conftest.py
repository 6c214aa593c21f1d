"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPUs are not needed to develop: sharding is validated on
``--xla_force_host_platform_device_count=8`` CPU devices, and numerics run
f32 on CPU exactly as they would on-chip.

NOTE: this environment injects an `axon` TPU-tunnel backend into every
python process via sitecustomize (PYTHONPATH=/root/.axon_site) and forces
``jax_platforms="axon,cpu"``.  Tests must NOT run through the tunnel (slow,
occasionally hangs on host transfers), so we re-force the platform to cpu
here before any array is created.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# POTA_LOCAL_COMPILE=1 forces fully local CPU compiles (no axon
# remote-compile round-trips).  Local compiles are crash-isolated but MUCH
# slower on this 2-vCPU host (fast tier 11 min vs 4.5; the sharded slow
# tier exceeds 30 min) — the remote service stays the default.  The flag
# is read at compile time, so popping here is sufficient.
if os.environ.get("POTA_LOCAL_COMPILE"):
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pota_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
