"""Cryptomatte spec fidelity: murmur3 float ids, sparse ranked coverage.

VERDICT r4 missing #3: the reference emits float *name-hash* ids ranked
per pixel from per-pixel hash maps (src/lentil_imager.cpp:121-160,
src/lentil.h:780-811); the dense [npix, n_ids] buffer capped id counts.
These tests pin the murmur3 hash against published cryptomatte reference
values, the sparse top-k extraction against a numpy oracle, and a 500-id
scene end to end.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu.render.crypto import (
    crypto_topk, id_hash_table, manifest, murmur3_32, name_hash_float,
    pack_layers,
)


def test_murmur3_known_vectors():
    """Standard MurmurHash3 x86_32 test vectors (seed 0)."""
    assert murmur3_32(b"") == 0x00000000
    assert murmur3_32(b"hello") == 0x248BFA47
    assert murmur3_32(b"hello, world") == 0x149BBB7F
    assert murmur3_32(b"The quick brown fox jumps over the lazy dog") == (
        0x2E4FF723
    )


def test_name_hash_float_spec():
    """The cryptomatte spec's float conversion: murmur bits reinterpreted,
    exponent nudged off 0/255 so ids are never inf/nan/denormal."""
    import math
    import struct

    for name in ["hello", "bunny", "sphere_000", "x" * 40, "", "flower"]:
        f = name_hash_float(name)
        assert math.isfinite(f)
        bits = struct.unpack("<I", struct.pack("<f", np.float32(f)))[0]
        exp = (bits >> 23) & 0xFF
        assert exp not in (0, 255)
        # when the raw hash already has a valid exponent the bits match
        raw = murmur3_32(name.encode())
        if (raw >> 23) & 0xFF not in (0, 255):
            assert bits == raw


def test_manifest_format():
    m = manifest(["a", "b"])
    assert set(m) == {"a", "b"}
    assert all(len(v) == 8 for v in m.values())
    assert m["a"] != m["b"]


def _oracle_topk(pix, oid, w, npix, k):
    """Numpy oracle: per-pixel id->weight maps, ranked by weight then id."""
    maps = [dict() for _ in range(npix)]
    for p, i, ww in zip(pix, oid, w):
        if ww > 0 and i >= 0 and 0 <= p < npix:
            maps[p][i] = maps[p].get(i, 0.0) + ww
    rank_id = np.full((npix, k), -1, np.int64)
    rank_w = np.zeros((npix, k))
    for p in range(npix):
        items = sorted(maps[p].items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (i, ww) in enumerate(items):
            rank_id[p, r] = i
            rank_w[p, r] = ww
    return rank_id, rank_w


def test_crypto_topk_matches_oracle():
    rng = np.random.default_rng(11)
    npix, n_ids, wtot, k = 37, 500, 5000, 6
    pix = rng.integers(0, npix, wtot)
    oid = rng.integers(-1, n_ids, wtot)
    w = np.round(rng.uniform(0, 1, wtot) * 64) / 64  # exact f32 sums
    w[rng.uniform(size=wtot) < 0.2] = 0.0
    rid, rw, total = crypto_topk(
        jnp.asarray(pix, jnp.int32), jnp.asarray(oid, jnp.int32),
        jnp.asarray(w, jnp.float32), npix, k=k,
    )
    rid, rw = np.asarray(rid), np.asarray(rw)
    oid_r, ow_r = _oracle_topk(pix, oid, w, npix, k)
    # weights must match rank for rank (weight ties may permute ids; compare
    # the sorted (id, weight) multisets per pixel too)
    np.testing.assert_allclose(rw, ow_r, rtol=1e-6, atol=1e-6)
    for p in range(npix):
        got = {(int(i), round(float(ww), 5))
               for i, ww in zip(rid[p], rw[p]) if i >= 0}
        want = {(int(i), round(float(ww), 5))
                for i, ww in zip(oid_r[p], ow_r[p]) if i >= 0}
        assert got == want, p
    live = (w > 0) & (oid >= 0)
    expect_total = np.zeros(npix)
    np.add.at(expect_total, pix[live], w[live])
    np.testing.assert_allclose(np.asarray(total), expect_total, rtol=1e-5)


def test_pack_layers_hash_ids():
    npix, k = 4, 6
    rid = jnp.asarray([[2, 0, -1, -1, -1, -1]] * npix, jnp.int32)
    rw = jnp.asarray([[0.6, 0.2, 0, 0, 0, 0]] * npix, jnp.float32)
    total = jnp.full((npix,), 0.8, jnp.float32)
    hashes = id_hash_table(["obj_a", "obj_b", "obj_c"])
    layers = pack_layers(rid, rw, total, ranks=3, id_hashes=hashes)
    l0 = np.asarray(layers[0])
    np.testing.assert_allclose(l0[:, 0], float(hashes[2]))
    np.testing.assert_allclose(l0[:, 1], 0.75)
    np.testing.assert_allclose(l0[:, 2], float(hashes[0]))
    np.testing.assert_allclose(l0[:, 3], 0.25)
    assert np.all(np.asarray(layers[2]) == 0.0)


def test_500_id_scene_end_to_end():
    """A 500-object scene renders ranked crypto AOVs without a dense
    [npix, n_ids] buffer (the r4 form would need npix*500 floats)."""
    from pota_tpu import CameraConfig, RenderConfig
    from pota_tpu.render import scene as sc
    from pota_tpu.render.renderer import look_at, render_frame
    from pota_tpu.render.splat import resolve_crypto

    rng = np.random.default_rng(3)
    n = 500
    centers = np.stack([
        rng.uniform(-60, 60, n), rng.uniform(-60, 60, n),
        rng.uniform(-420, -180, n),
    ], -1).astype(np.float32)
    scene = sc.SphereScene(
        centers=jnp.asarray(centers),
        radii=jnp.full((n,), 3.0, jnp.float32),
        emission=jnp.asarray(
            rng.uniform(0.5, 8.0, (n, 3)).astype(np.float32)),
        albedo=jnp.zeros((n, 3), jnp.float32),
        sky_color=jnp.zeros((3,), jnp.float32),
        light_dir=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        light_color=jnp.zeros((3,), jnp.float32),
    )
    cfg = CameraConfig(focal_length=65.0, fstop=1.8, focus_distance=150.0,
                       vignetting_retries=1, max_bidir_samples=8,
                       splat_queue_mult=4)
    rc = RenderConfig(xres=64, yres=64, spp=2, enable_id_matte=True)
    img, fb = render_frame(cfg, rc, scene, look_at([0, 0, 0], [0, 0, -1]),
                           seed=0)
    assert fb["crypto_rank_id"].shape == (64, 64, 6)
    hashes = id_hash_table([f"sphere_{i:03d}" for i in range(n)])
    layers = resolve_crypto(fb, ranks=3, id_hashes=hashes)
    l0 = np.asarray(layers[0])
    assert np.isfinite(l0).all()
    covered = l0[..., 1] > 0
    assert covered.any()
    # covered ids are real spec hashes from the table
    ids = np.unique(l0[..., 0][covered]).astype(np.float32)
    assert np.isin(ids, np.asarray(hashes)).all()
    # coverage normalized
    assert (l0[..., 1] <= 1.0 + 1e-5).all()
