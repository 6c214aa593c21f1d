"""Parity tests for the sorted one-hot-matmul splat accumulator.

The kernel (ops/splat_accum.py) must reproduce, bit-for-equivalent, the
scatter-add + two-pass scatter-min semantics it replaces in
render/splat.py: per-pixel payload sums, and the closest-by-depth winner
with ties broken by original writer order (the reference's tolerated write
races made deterministic, ref src/lentil.h:823-929).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu.ops.splat_accum import BAND_PX, CHUNK, accumulate_sorted


def _reference(pix, depth, payload, sample_id, npix):
    """Scatter-style oracle in numpy."""
    k = payload.shape[1]
    accum = np.zeros((npix, k), np.float64)
    winner_depth = np.zeros((npix,), np.float32)
    winner_sample = np.zeros((npix,), np.int32)
    has_winner = np.zeros((npix,), bool)
    best = np.full((npix,), np.inf)
    for i in range(pix.shape[0]):
        p = pix[i]
        if p >= npix:
            continue
        accum[p] += payload[i]
        if depth[i] < best[p]:  # strict: first writer wins ties
            best[p] = depth[i]
            winner_depth[p] = depth[i]
            winner_sample[p] = sample_id[i]
            has_winner[p] = True
    return accum, winner_depth, winner_sample, has_winner


def _run_case(npix, n_writers, k, seed, dead_frac=0.2, dup_depths=False):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, npix, n_writers).astype(np.int32)
    dead = rng.uniform(size=n_writers) < dead_frac
    pix[dead] = npix
    depth = rng.uniform(1.0, 100.0, n_writers).astype(np.float32)
    if dup_depths:
        depth = np.round(depth)  # force depth ties -> writer-order tiebreak
    payload = rng.normal(size=(n_writers, k)).astype(np.float32)
    sid = rng.integers(0, 1 << 20, n_writers).astype(np.int32)

    got = accumulate_sorted(
        jnp.asarray(pix), jnp.asarray(depth), jnp.asarray(payload),
        jnp.asarray(sid), npix, interpret=True,
    )
    want = _reference(pix, depth, payload, sid, npix)
    np.testing.assert_allclose(np.asarray(got[0]), want[0], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), want[1], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[3]), want[3])
    np.testing.assert_array_equal(
        np.asarray(got[2])[want[3]], want[2][want[3]]
    )


def test_small_dense():
    _run_case(npix=500, n_writers=4000, k=5, seed=0)


def test_multi_band_sparse():
    # > 2 bands, sparse writers: empty bands must resolve to zeros
    _run_case(npix=3 * BAND_PX + 17, n_writers=900, k=5, seed=1,
              dead_frac=0.5)


def test_depth_ties_break_by_writer_order():
    _run_case(npix=300, n_writers=3000, k=2, seed=2, dup_depths=True)


def test_hotspot_single_pixel():
    # all writers hit one pixel: exercises many chunks -> one band entry run
    rng = np.random.default_rng(3)
    n = 3 * CHUNK + 11
    npix = BAND_PX + 5
    pix = np.full(n, 7, np.int32)
    depth = rng.uniform(1.0, 9.0, n).astype(np.float32)
    payload = rng.normal(size=(n, 5)).astype(np.float32)
    sid = np.arange(n, dtype=np.int32)
    got = accumulate_sorted(jnp.asarray(pix), jnp.asarray(depth),
                            jnp.asarray(payload), jnp.asarray(sid), npix,
                            interpret=True)
    want = _reference(pix, depth, payload, sid, npix)
    np.testing.assert_allclose(np.asarray(got[0]), want[0], rtol=1e-4,
                               atol=1e-4)
    assert np.asarray(got[2])[7] == want[2][7]
    assert np.asarray(got[3]).sum() == 1


def test_all_dead_writers():
    rng = np.random.default_rng(4)
    n = 100
    npix = 600
    pix = np.full(n, npix, np.int32)
    got = accumulate_sorted(
        jnp.asarray(pix),
        jnp.asarray(rng.uniform(1, 2, n).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        jnp.zeros(n, jnp.int32), npix, interpret=True,
    )
    assert np.allclose(np.asarray(got[0]), 0.0)
    assert not np.asarray(got[3]).any()
