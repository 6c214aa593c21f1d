"""Unit tests for the counter-based RNG (TEA / LCG)."""
import numpy as np
import jax.numpy as jnp

from pota_tpu.utils import rng as prng


def _tea8_ref(val0: int, val1: int) -> int:
    """Pure-python TEA-8 (independent re-implementation for cross-checking)."""
    mask = 0xFFFFFFFF
    v0, v1, s0 = val0 & mask, val1 & mask, 0
    for _ in range(8):
        s0 = (s0 + 0x9E3779B9) & mask
        v0 = (
            v0
            + ((((v1 << 4) & mask) + 0xA341316C) ^ ((v1 + s0) & mask) ^ ((v1 >> 5) + 0xC8013EA4))
        ) & mask
        v1 = (
            v1
            + ((((v0 << 4) & mask) + 0xAD90777D) ^ ((v0 + s0) & mask) ^ ((v0 >> 5) + 0x7E95761E))
        ) & mask
    return v0


def test_tea_matches_scalar_reference():
    pairs = [(0, 0), (1, 0), (0, 1), (123456, 789), (2**31, 2**20 + 17)]
    for a, b in pairs:
        got = int(prng.tea(jnp.uint32(a), jnp.uint32(b)))
        assert got == _tea8_ref(a, b), (a, b)


def test_tea_vectorized_consistency():
    a = jnp.arange(100, dtype=jnp.uint32)
    b = jnp.full((100,), 7, dtype=jnp.uint32)
    vec = np.asarray(prng.tea(a, b))
    for i in range(0, 100, 17):
        assert vec[i] == _tea8_ref(i, 7)


def test_uniforms_in_range_and_deterministic():
    u1 = np.asarray(prng.uniforms(jnp.uint32(42), jnp.uint32(3), 8))
    u2 = np.asarray(prng.uniforms(jnp.uint32(42), jnp.uint32(3), 8))
    assert np.all(u1 >= 0.0) and np.all(u1 < 1.0)
    np.testing.assert_array_equal(u1, u2)
    # different counters decorrelate
    u3 = np.asarray(prng.uniforms(jnp.uint32(42), jnp.uint32(4), 8))
    assert not np.allclose(u1, u3)


def test_uniforms_roughly_uniform():
    keys = jnp.arange(4096, dtype=jnp.uint32)
    u = np.asarray(prng.uniforms(keys, jnp.uint32(0), 2))
    assert abs(u.mean() - 0.5) < 0.02
    assert abs(np.percentile(u, 25) - 0.25) < 0.03
