"""Cryptomatte id-matte machinery (spec-fidelity version).

The reference redistributes cryptomatte coverage along with RGB by
accumulating per-pixel ``hash -> weight`` maps during the splat and rank-
extracting them in the imager (zpelgrims/pota ``src/lentil.h:780-819``,
``src/lentil_imager.cpp:121-160``); the ids are **float-reinterpreted
MurmurHash3 name hashes** per the Cryptomatte spec, carried by the
CryptomatteArnold sibling library.

TPU-native design: per-pixel hash maps are replaced by a **sparse two-sort
rank extraction** over the splat's writer stream — memory is O(writers +
npix*k), independent of the scene's id count (the r4 dense ``[npix,
n_ids]`` buffer capped practical id counts at ~100 @1080p):

1. coalesce: stable sort writers by ``(pixel, id)``; a cumsum-difference
   per run yields each (pixel, id) pair's total coverage weight;
2. rank: sort the run records by ``(pixel, -weight)``; each record's rank
   within its pixel segment comes from a prefix-scan, and records with
   rank < k scatter into dense ``[npix, k]`` id/weight planes.

Both passes are plain ``lax.sort``/scan/scatter — deterministic,
TPU-friendly, CPU-testable.
"""
from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------ name hashing --


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86_32 (the Cryptomatte spec's name hash)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    rotl = lambda x, r: ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = rotl(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[nblocks * 4:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = rotl(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def name_hash_float(name: str) -> float:
    """Name -> float32 id per the Cryptomatte spec: the Murmur3 bits are
    reinterpreted as float, with the exponent nudged off 0/255 so the id
    is never inf/nan/denormal (the spec's bit trick)."""
    bits = murmur3_32(name.encode("utf-8"))
    exponent = (bits >> 23) & 0xFF
    if exponent == 0 or exponent == 255:
        bits ^= 1 << 23
    return float(np.frombuffer(struct.pack("<I", bits), np.float32)[0])


def manifest(names) -> dict:
    """Cryptomatte sidecar manifest: name -> 8-hex-digit hash string."""
    out = {}
    for name in names:
        bits = murmur3_32(name.encode("utf-8"))
        exponent = (bits >> 23) & 0xFF
        if exponent == 0 or exponent == 255:
            bits ^= 1 << 23
        out[name] = f"{bits:08x}"
    return out


def id_hash_table(names) -> jnp.ndarray:
    """[n] float32 table mapping scene object index -> spec name-hash id."""
    return jnp.asarray([name_hash_float(n) for n in names], jnp.float32)


# -------------------------------------------------------- sparse rank topk --


def _seg_start_scan(mark, values, fill):
    """Per element: ``values`` at the most recent position where ``mark``
    is True (inclusive).  associative max-scan over (position, value)."""
    idx = jnp.where(mark, jnp.arange(mark.shape[0]), -1)
    run_idx = jax.lax.associative_scan(jnp.maximum, idx)
    safe = jnp.maximum(run_idx, 0)
    v = values[safe]
    return jnp.where(run_idx >= 0, v, fill)


def crypto_topk(pix, obj_id, w, npix: int, k: int = 6):
    """Sparse per-pixel top-k (id, weight) extraction from a writer stream.

    Args:
      pix: [W] int32 target pixel per writer (dead writers: any value with
        w == 0 or obj_id < 0).
      obj_id: [W] int32 scene object index per writer.
      w: [W] f32 coverage weight per writer.
      npix: pixel count.
      k: ranks to keep per pixel (the reference's cryptomatte depth).

    Returns (rank_id [npix, k] int32 with -1 padding, rank_w [npix, k] f32,
    total [npix] f32).
    """
    wtot = pix.shape[0]
    live = (w > 0.0) & (obj_id >= 0)
    pixs = jnp.where(live, pix, npix).astype(jnp.int32)
    ids = jnp.where(live, obj_id, 0).astype(jnp.int32)
    wl = jnp.where(live, w, 0.0)

    # ---- pass 1: coalesce (pixel, id) runs --------------------------------
    sp, si, sw = jax.lax.sort((pixs, ids, wl), num_keys=2)
    csum = jnp.cumsum(sw)
    csum_prev = jnp.concatenate([jnp.zeros((1,), sw.dtype), csum[:-1]])
    first = jnp.concatenate([
        jnp.ones((1,), bool), (sp[1:] != sp[:-1]) | (si[1:] != si[:-1])
    ])
    last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    run_start_csum = _seg_start_scan(first, csum_prev, 0.0)
    total_run = csum - run_start_csum          # valid at run ends

    # ---- pass 2: rank runs per pixel by weight ----------------------------
    rec_on = last & (sp < npix) & (total_run > 0.0)
    rpix = jnp.where(rec_on, sp, npix)
    rw = jnp.where(rec_on, total_run, 0.0)
    rid = jnp.where(rec_on, si, -1)
    sp2, negw2, rid2, rw2 = jax.lax.sort(
        (rpix, -rw, rid, rw), num_keys=2
    )
    pfirst = jnp.concatenate([
        jnp.ones((1,), bool), sp2[1:] != sp2[:-1]
    ])
    pos = jnp.arange(wtot, dtype=jnp.int32)
    seg_start = _seg_start_scan(pfirst, pos, 0)
    rank = pos - seg_start
    keep = (sp2 < npix) & (rank < k) & (rid2 >= 0)
    slot = jnp.where(keep, sp2 * k + rank, npix * k)
    rank_id = jnp.full((npix * k,), -1, jnp.int32).at[slot].set(
        jnp.where(keep, rid2, -1), mode="drop"
    )
    rank_w = jnp.zeros((npix * k,), w.dtype).at[slot].set(
        jnp.where(keep, rw2, 0.0), mode="drop"
    )

    total = jnp.zeros((npix,), w.dtype).at[pixs].add(wl, mode="drop")
    return (rank_id.reshape(npix, k), rank_w.reshape(npix, k), total)


def pack_layers(rank_id, rank_w, total, ranks: int = 3, id_hashes=None):
    """Pack ranked results into standard cryptomatte RGBA layers.

    Each layer holds two (id, coverage) pairs ranked by weight, coverage
    normalized by the pixel's total weight — the reference imager's rank
    extraction (src/lentil_imager.cpp:121-160).  ``id_hashes`` ([n_objects]
    f32 from :func:`id_hash_table`) maps scene indices to spec float
    hashes; without it the raw scene index rides as a float id.
    """
    npix, k = rank_w.shape
    tot = jnp.maximum(total, 1e-12)[:, None]
    # the run cumsum and the total scatter-add accumulate in different
    # orders; clamp the ~1e-4 overshoot so coverage stays in [0, 1]
    cov = jnp.minimum(jnp.where(rank_w > 0.0, rank_w / tot, 0.0), 1.0)
    if id_hashes is not None:
        idf = id_hashes[jnp.maximum(rank_id, 0)]
    else:
        idf = rank_id.astype(jnp.float32)
    idf = jnp.where(rank_w > 0.0, idf, 0.0)
    layers = []
    zeros = jnp.zeros((npix,), rank_w.dtype)
    for r in range(ranks):
        i0, i1 = 2 * r, 2 * r + 1
        c0 = cov[:, i0] if i0 < k else zeros
        d0 = idf[:, i0] if i0 < k else zeros
        c1 = cov[:, i1] if i1 < k else zeros
        d1 = idf[:, i1] if i1 < k else zeros
        layers.append(jnp.stack([d0, c0, d1, c1], -1))
    return layers
