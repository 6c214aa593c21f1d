"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPUs are not needed to develop: sharding is validated on
``--xla_force_host_platform_device_count=8`` CPU devices, and numerics run
f32 on CPU exactly as they would on-chip.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pota_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
