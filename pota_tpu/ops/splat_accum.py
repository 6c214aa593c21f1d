"""Sorted one-hot-matmul splat accumulator (Pallas TPU).

The splat's framebuffer accumulation originally issued one XLA scatter per
payload column plus two scatter-mins for the closest-filter winner — and
every XLA TPU scatter internally re-sorts its 18.6M updates (measured r4:
131 ms per scatter-add, 151 ms per scatter-min; the full accumulate+winner
stage was 1.55 s of the 3.2 s flagship splat).

This module pays for ONE shared sort and derives everything from it:

  1. ``lax.sort`` by (pixel, depth) with a stable permutation passenger
     (115 ms at 18.6M) — the same order serves both accumulation and the
     closest-winner selection (first row of each pixel segment = smallest
     depth, ties broken by original writer order exactly like the old
     two-pass scatter-min);
  2. payload columns gathered once by the permutation;
  3. a Pallas kernel walks the sorted stream in 1024-row chunks with a
     scalar-prefetched work list of (band, chunk) pairs: each output band
     of ``BAND_PX`` pixels accumulates in VMEM with ONE MXU contraction
     per chunk — ``delta[R, P] = payload[R, C] @ onehot[C, P]`` — the
     round-2 plan's "sort-by-tile + VMEM accumulation" (NOTES.md), and the
     TPU-native form of the reference's CUDA per-sample splat kernel
     (/root/reference/src/cuda_prototype/lentil_thin_lens_bokeh_cuda.cu:211-277).

Layout note (why two input layouts): the one-hot needs the chunk's pixel
ids on SUBLANES ([C, 1] blocks) so ``local == iota`` broadcasts into the
[C, P] operand without any lane<->sublane transpose, while the payload
rows ride LANES ([1, C] blocks) so ``jnp.stack`` forms the [R, C] operand
directly.  A first cut that batched 128-wide matmuls per sublane issued
768 tiny MXU ops per chunk and ran at 1.05 s/frame; this single-matmul
form is the fix.

Winner selection rides the same matmul: the sorted stream's per-pixel
first-occurrence mask (applied on the payload side) selects exactly one
row per pixel, so summing ``mask * depth`` / ``mask * sample_id`` IS the
winner gather.

Not differentiable (inference path only — the differentiable training
surface keeps the linear scatter-add form in render/splat.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND_PX = 1024    # output pixels per band (the one-hot's lane extent)
CHUNK = 1024      # sorted-stream rows per grid step (contraction extent)
N_ROWS_PAD = 8    # accumulator row tile (f32 sublane)


def _pad_rows(k: int) -> int:
    return ((k + 3 + N_ROWS_PAD - 1) // N_ROWS_PAD) * N_ROWS_PAD


def _accum_kernel(n_payload: int, band_px: int,
                  band_ref, chunk_ref, live_ref, first_ref,
                  pix_sub_ref, focc_ref, depth_ref, sid_ref, *refs):
    """One (band, chunk) work entry: accumulate a 1024-row chunk of the
    sorted stream into this band's [R, band_px] VMEM block with a single
    MXU contraction over the chunk.

    Input streams ride [n_groups, 8, CHUNK] arrays — 8 chunks per tiled
    group, zero tile padding (the earlier [C, 1] / [1, C] blocked 3-D
    forms padded their unit dim to 128/8 lanes, a 21 GB HBM blow-up at
    4K); the kernel slices its chunk's row and relays the pixel ids onto
    sublanes itself."""
    payload_refs = refs[:n_payload]
    out_ref = refs[n_payload]
    w = pl.program_id(0)
    base = (band_ref[w] * band_px).astype(jnp.float32)
    cmod = chunk_ref[w] % 8

    def row_of(ref):
        return ref[0, pl.ds(cmod, 1), :]               # [1, C] lanes

    pix_row = row_of(pix_sub_ref)
    local = pix_row.reshape(pix_row.shape[1], 1) - base  # [C, 1] sublanes
    in_band = (local >= 0.0) & (local < float(band_px))
    in_band &= live_ref[w] > 0
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (local.shape[0], band_px), 1
    ).astype(jnp.float32)
    onehot = jnp.where(in_band & (local == cols), 1.0, 0.0)  # [C, P]

    focc = row_of(focc_ref)                            # [1, C] lanes
    rows = [row_of(r) for r in payload_refs]
    rows.append(focc * row_of(depth_ref))
    rows.append(focc * row_of(sid_ref))
    rows.append(focc)
    n_rows = out_ref.shape[1]
    while len(rows) < n_rows:
        rows.append(jnp.zeros_like(focc))
    stack = jnp.concatenate(rows, 0)                   # [R, C]

    # the payload side must keep full f32 mantissas (default MXU precision
    # truncates operands to bf16 — measured 3.7e-2 abs err); HIGHEST is the
    # exact bf16x3 decomposition
    delta = jax.lax.dot_general(
        stack, onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                  # [R, band_px]

    @pl.when(first_ref[w] == 1)
    def _():
        out_ref[0] = delta

    @pl.when(first_ref[w] == 0)
    def _():
        out_ref[0] += delta


def sort_writers_with_payload(pix, depth, cols, sid):
    """(pixel, depth) stable sort carrying the payload as PASSENGERS.

    r4 profiling: post-sort permutation gathers ran at ~1 GiB/s; letting
    ``lax.sort`` move the payload costs only the extra operand bandwidth
    of the sort itself.  Returns (sorted_pix, sorted_depth, sorted_cols,
    sorted_sid, first_occurrence).
    """
    ops = jax.lax.sort((pix, depth, sid) + tuple(cols), num_keys=2,
                       is_stable=True)
    sp, dep_s, sid_s = ops[0], ops[1], ops[2]
    cols_s = list(ops[3:])
    focc = jnp.concatenate(
        [jnp.ones((1,), jnp.float32),
         (sp[1:] != sp[:-1]).astype(jnp.float32)]
    )
    return sp, dep_s, cols_s, sid_s, focc


def sort_writers(pix, depth):
    """The shared (pixel, depth) stable sort.

    Returns (sorted_pix, sorted_depth, perm, first_occurrence): everything
    downstream — payload gathers, the accumulation kernel and the winner
    selection — derives from this one sort.
    """
    wtot = pix.shape[0]
    perm0 = jnp.arange(wtot, dtype=jnp.int32)
    sp, dep_s, perm = jax.lax.sort((pix, depth, perm0), num_keys=2,
                                   is_stable=True)
    focc = jnp.concatenate(
        [jnp.ones((1,), jnp.float32),
         (sp[1:] != sp[:-1]).astype(jnp.float32)]
    )
    return sp, dep_s, perm, focc


def accumulate_presorted(sp, cols_sorted, dep_s, sid_s, focc, npix: int,
                         interpret: bool = False):
    """Kernel stage over an ALREADY-SORTED writer stream.

    ``cols_sorted``: list of [W] f32 payload columns in sorted order
    (callers with per-sample value tables should gather them via the
    composed index ``sample_of_writer[perm]`` — one small-table gather per
    column instead of materializing and permuting a [W, K] payload).
    Returns (accum [npix, K], winner_depth, winner_sample, has_winner).
    """
    wtot = sp.shape[0]
    k = len(cols_sorted)
    n_rows = _pad_rows(k)
    n_bands = -(-npix // BAND_PX)

    # pad the stream to whole 8-chunk GROUPS with sentinel rows: every
    # stream rides an [n_groups, 8, CHUNK] array whose tiled trailing dims
    # (8, CHUNK) carry zero padding — the minimal HBM footprint
    n_chunks = -(-wtot // CHUNK)
    n_groups = -(-n_chunks // 8)
    wpad = n_groups * 8 * CHUNK
    padn = wpad - wtot
    lane = (n_groups, 8, CHUNK)
    sp_p = jnp.pad(sp, (0, padn), constant_values=npix).astype(
        jnp.float32).reshape(lane)
    focc_p = jnp.pad(focc, (0, padn)).reshape(lane)
    dep_p = jnp.pad(dep_s, (0, padn)).reshape(lane)
    sid_p = jnp.pad(sid_s, (0, padn)).reshape(lane)
    pay_p = [
        jnp.pad(c_, (0, padn)).reshape(lane) for c_ in cols_sorted
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

    lane_spec = pl.BlockSpec(
        (1, 8, CHUNK), lambda w, b, c, l, f: (c[w] // 8, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(w_max,),
        in_specs=[lane_spec] * (4 + k),
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
    sp, dep_s, perm, focc = sort_writers(pix, depth)
    cols = [payload[perm, c] for c in range(payload.shape[1])]
    sid_s = sample_id[perm].astype(jnp.float32)
    return accumulate_presorted(sp, cols, dep_s, sid_s, focc, npix,
                                interpret=interpret)
