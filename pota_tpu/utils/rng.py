"""Counter-based RNG primitives (TEA hash + LCG), vectorized for TPU.

The reference (zpelgrims/pota) seeds its backward-redistribution sampling with
``tea<8>(px*py+px, sample_idx)`` and draws successive uniforms with a 32-bit
LCG (``src/global.h:32-57``), and uses a *stateful* xorshift (``xor128``,
``src/global.h:22-27``) for retry randomness.  A stateful generator is neither
reproducible nor vectorizable, so the TPU build replaces every draw with a
counter-based scheme: TEA-hash a (key, counter) pair, then run the same LCG a
fixed number of steps.  This keeps the reference's per-(pixel, sample)
determinism (SURVEY.md C9) while being stateless, vmappable and jittable.

All functions operate on uint32 arrays of any shape.
"""
from __future__ import annotations

import jax.numpy as jnp

_TEA_DELTA = jnp.uint32(0x9E3779B9)
_LCG_MUL = jnp.uint32(1664525)
_LCG_ADD = jnp.uint32(1013904223)


def tea(val0, val1, rounds: int = 8):
    """Tiny Encryption Algorithm hash of two uint32 words -> uint32.

    Bit-exact with the reference's ``tea<8>`` (src/global.h:32-46).
    """
    v0 = jnp.asarray(val0, jnp.uint32)
    v1 = jnp.asarray(val1, jnp.uint32)
    s0 = jnp.uint32(0)
    for _ in range(rounds):
        s0 = s0 + _TEA_DELTA
        v0 = v0 + (
            ((v1 << 4) + jnp.uint32(0xA341316C))
            ^ (v1 + s0)
            ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + jnp.uint32(0xAD90777D))
            ^ (v0 + s0)
            ^ ((v0 >> 5) + jnp.uint32(0x7E95761E))
        )
    return v0


def lcg_step(state):
    """One LCG step; returns (new_state, uniform in [0,1)).

    Matches the reference's ``rng()`` (src/global.h:51-57): uses the lower 24
    bits of the state.
    """
    state = state * _LCG_MUL + _LCG_ADD
    u = (state & jnp.uint32(0x00FFFFFF)).astype(jnp.float32) / jnp.float32(0x01000000)
    return state, u


def uniforms(key0, key1, n: int):
    """Draw ``n`` uniforms per element by TEA-seeding an LCG and stepping it.

    Returns an array of shape ``key.shape + (n,)`` with values in [0, 1).
    This reproduces the reference's `seed = tea<8>(a,b); rng(seed)...` idiom.
    """
    state = tea(key0, key1)
    outs = []
    for _ in range(n):
        state, u = lcg_step(state)
        outs.append(u)
    return jnp.stack(outs, axis=-1)


def hash_uniform(key0, key1):
    """Single uniform in [0,1) from a (key, counter) pair (TEA + one LCG step)."""
    return uniforms(key0, key1, 1)[..., 0]
