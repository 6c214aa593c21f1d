"""Sorted one-hot-matmul splat accumulator (Pallas TPU).

The splat's framebuffer accumulation originally issued one XLA scatter per
payload column plus two scatter-mins for the closest-filter winner — and
every XLA TPU scatter internally re-sorts its 18.6M updates (measured r4:
131 ms per scatter-add, 151 ms per scatter-min; the full accumulate+winner
stage was 1.55 s of the 3.2 s flagship splat).

This module pays for ONE shared sort and derives everything from it:

  1. ``lax.sort`` by (pixel, depth) with a stable permutation passenger
     (122 ms at 18.6M) — the same order serves both accumulation and the
     closest-winner selection (first row of each pixel segment = smallest
     depth, ties broken by original writer order exactly like the old
     two-pass scatter-min);
  2. payload columns gathered once by the permutation;
  3. a Pallas kernel walks the sorted stream in aligned chunks with a
     scalar-prefetched work list of (band, chunk) pairs: each output band
     of ``band_px`` pixels accumulates in VMEM via a one-hot matmul on the
     MXU ([chunk, band_px] one-hot x [chunk, rows] payload), one HBM write
     per band — the round-2 plan's "sort-by-tile + VMEM accumulation"
     (NOTES.md), and the TPU-native form of the reference's CUDA
     per-sample splat kernel
     (/root/reference/src/cuda_prototype/lentil_thin_lens_bokeh_cuda.cu:211-277).

Winner selection rides the same matmul: the sorted stream's per-pixel
first-occurrence mask selects exactly one row per pixel, so summing
``mask * depth`` / ``mask * sample_id`` IS the winner gather.

Not differentiable (inference path only — the differentiable training
surface keeps the linear scatter-add form in render/splat.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND_PX = 2048    # output pixels per band (lane-dim of the accumulator)
CHUNK = 1024      # sorted-stream rows per grid step (one (8, 128) tile)
_SUB = 8
_LANE = 128
N_ROWS_PAD = 8    # accumulator row tile (f32 sublane)


def _pad_rows(k: int) -> int:
    return ((k + 3 + N_ROWS_PAD - 1) // N_ROWS_PAD) * N_ROWS_PAD


def _accum_kernel(n_payload: int, band_px: int,
                  band_ref, chunk_ref, live_ref, first_ref,
                  pix_ref, focc_ref, depth_ref, sid_ref, *refs):
    """One (band, chunk) work entry: accumulate a 1024-row chunk of the
    sorted stream into this band's [R, band_px] VMEM block.

    The chunk lives in its natural (8, 128) tile.  The band-local pixel
    index is split ``local = hi * 128 + lo``; a single lane-onehot
    ``[8, 128, 128]`` (no transposes) serves all ``band_px / 128`` hi
    groups, each accumulated with one MXU contraction over the chunk.
    """
    payload_refs = refs[:n_payload]
    out_ref = refs[n_payload]
    w = pl.program_id(0)
    base = (band_ref[w] * band_px).astype(jnp.float32)

    pix = pix_ref[0]                                   # [8, 128] f32
    local = pix - base
    in_band = (local >= 0.0) & (local < float(band_px))
    in_band &= live_ref[w] > 0
    localc = jnp.clip(local, 0.0, float(band_px - 1))
    hi = jnp.floor(localc * (1.0 / _LANE))
    lo = localc - hi * _LANE

    lanes = jax.lax.broadcasted_iota(
        jnp.int32, (_SUB, _LANE, _LANE), 2
    ).astype(jnp.float32)
    onehot_lo = jnp.where(lo[:, :, None] == lanes, 1.0, 0.0)

    focc = focc_ref[0]
    rows = [r[0] for r in payload_refs]
    rows.append(focc * depth_ref[0])
    rows.append(focc * sid_ref[0])
    rows.append(focc)
    n_rows = out_ref.shape[1]
    while len(rows) < n_rows:
        rows.append(jnp.zeros_like(focc))
    stack = jnp.stack(rows, 1)                         # [8, R, 128]

    parts = []
    for h in range(band_px // _LANE):
        mask_h = jnp.where(in_band & (hi == float(h)), 1.0, 0.0)
        # batched over the sublane dim (Mosaic matmul wants exactly one
        # contracting dim): [8, R, 128] x [8, 128, 128] -> [8, R, 128]
        # the payload side must keep full f32 mantissas (default MXU
        # precision truncates operands to bf16 — measured 3.7e-2 abs err);
        # Mosaic rejects per-operand precision, so run the matmul at
        # HIGHEST (bf16x3 decomposition, exact for f32 inputs)
        out_h = jax.lax.dot_general(
            stack * mask_h[:, None, :], onehot_lo,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        parts.append(jnp.sum(out_h, 0))                # [R, 128]
    delta = jnp.concatenate(parts, -1)                 # [R, band_px]

    @pl.when(first_ref[w] == 1)
    def _():
        out_ref[0] = delta

    @pl.when(first_ref[w] == 0)
    def _():
        out_ref[0] += delta


def accumulate_sorted(pix, depth, payload, sample_id, npix: int,
                      interpret: bool = False):
    """Segment-sum + closest-winner over a writer stream in one sorted pass.

    Args:
      pix: [W] int32 target pixel per writer; dead writers carry the
        sentinel ``npix`` (they sort past every band and are ignored).
      depth: [W] f32 depth per writer (winner = min depth, ties by
        original order).
      payload: [W, K] f32 columns to segment-sum per pixel.
      sample_id: [W] int32 source-sample id gathered back for the winner
        (must stay < 2^24 so the f32 matmul path is exact).
      npix: number of output pixels.

    Returns (accum [npix, K], winner_depth [npix], winner_sample [npix]
    int32, has_winner [npix] bool).
    """
    wtot = pix.shape[0]
    k = payload.shape[1]
    n_rows = _pad_rows(k)
    n_bands = -(-npix // BAND_PX)

    perm0 = jnp.arange(wtot, dtype=jnp.int32)
    sp, _, perm = jax.lax.sort((pix, depth, perm0), num_keys=2,
                               is_stable=True)
    pay_s = payload[perm]
    sid_s = sample_id[perm].astype(jnp.float32)
    dep_s = depth[perm]
    # per-pixel first occurrence in sorted order = the closest winner
    focc = jnp.concatenate(
        [jnp.ones((1,), jnp.float32),
         (sp[1:] != sp[:-1]).astype(jnp.float32)]
    )

    # pad the stream to whole chunks with sentinel rows; each chunk is one
    # natural (8, 128) f32 tile (pixel ids stay exact in f32: < 2^24)
    n_chunks = -(-wtot // CHUNK)
    wpad = n_chunks * CHUNK
    padn = wpad - wtot
    shape3 = (n_chunks, _SUB, _LANE)
    sp_p = jnp.pad(sp, (0, padn), constant_values=npix).astype(
        jnp.float32).reshape(shape3)
    focc_p = jnp.pad(focc, (0, padn)).reshape(shape3)
    dep_p = jnp.pad(dep_s, (0, padn)).reshape(shape3)
    sid_p = jnp.pad(sid_s, (0, padn)).reshape(shape3)
    pay_p = [
        jnp.pad(pay_s[:, c], (0, padn)).reshape(shape3)
        for c in range(k)
    ]

    # ---- work list: (band, chunk) pairs over the sorted stream ----------
    band_edges = jnp.arange(n_bands + 1, dtype=jnp.int32) * BAND_PX
    starts = jnp.searchsorted(sp, band_edges[:-1]).astype(jnp.int32)
    ends = jnp.concatenate(
        [starts[1:], jnp.searchsorted(sp, npix).astype(jnp.int32)[None]]
    )
    cnt = ends - starts
    # every band gets >= 1 entry so its accumulator is zeroed exactly once
    # and bands are visited in one consecutive run each
    n_entries = jnp.where(
        cnt > 0, (ends - 1) // CHUNK - starts // CHUNK + 1, 1
    ).astype(jnp.int32)
    off = jnp.cumsum(n_entries)
    w_max = n_chunks + n_bands  # static upper bound on total entries
    w_idx = jnp.arange(w_max, dtype=jnp.int32)
    b_of_w = jnp.searchsorted(off, w_idx, side="right").astype(jnp.int32)
    live = (b_of_w < n_bands).astype(jnp.int32)
    # padding entries replay the LAST band (already initialized, masked out)
    b_cl = jnp.minimum(b_of_w, n_bands - 1)
    local_e = w_idx - (off[b_cl] - n_entries[b_cl])
    g_of_w = jnp.clip(starts[b_cl] // CHUNK + local_e, 0, n_chunks - 1)
    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (b_cl[1:] != b_cl[:-1]).astype(jnp.int32)]
    )

    chunk_spec = pl.BlockSpec(
        (1, _SUB, _LANE), lambda w, b, c, l, f: (c[w], 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(w_max,),
        in_specs=[chunk_spec] * (4 + k),
        out_specs=pl.BlockSpec(
            (1, n_rows, BAND_PX), lambda w, b, c, l, f: (b[w], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_accum_kernel, k, BAND_PX),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_bands, n_rows, BAND_PX),
                                       jnp.float32),
        interpret=interpret,
    )(b_cl, g_of_w, live, is_first,
      sp_p, focc_p, dep_p, sid_p, *pay_p)

    flat = out.transpose(0, 2, 1).reshape(n_bands * BAND_PX, n_rows)[:npix]
    accum = flat[:, :k]
    winner_depth = flat[:, k]
    winner_sample = flat[:, k + 1].astype(jnp.int32)
    has_winner = flat[:, k + 2] > 0.5
    return accum, winner_depth, winner_sample, has_winner
