"""Multi-chip sharding: rays over the mesh, framebuffers reduced over ICI.

The reference has no distributed layer at all (SURVEY.md §2: thread-parallel
buckets splatting into shared buffers with tolerated races).  The TPU
equivalents here, per BASELINE.json's north star:

* **ray/data parallelism**: the frame's sample stream is sharded over the
  mesh's ``rays`` axis (the analog of Arnold handing buckets to threads);
* **splat exchange**: each shard scatter-adds into its own full-frame
  partial buffer; a single ``psum`` over the mesh merges them (the analog of
  the racy shared buffer — but deterministic).  Because scatter-add is
  linear, the VJP of the whole splat is clean and the lens-coefficient
  gradient all-reduce rides the same collective machinery;
* **tile sharding of the resolve** (and reduce_scatter instead of psum) is
  the next refinement — the resolve is elementwise so XLA shards it with a
  sharding constraint for free.

Everything is built on ``shard_map`` over an explicit ``jax.sharding.Mesh``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import CameraConfig, RenderConfig
from ..render import sampling
from ..render.renderer import _transform_rays, trace_camera_rays
from ..render.splat import resolve_imager, splat_frame


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def splat_halo_rows(cfg: CameraConfig, rc: RenderConfig, scene,
                    po_state=None, margin: float = 1.5) -> int:
    """Conservative bound (in pixel rows) on how far a backward splat can
    land from its source pixel — the halo a row-sharded merge must exchange.

    Redistribution moves energy at most one circle-of-confusion radius from
    the source (the defining property of the reference's bidirectional
    filter, src/lentil_filter.cpp:311-446), so the bound is the max CoC
    over the scene's depth range (CoC is monotone in 1/z: its max over an
    interval is at an endpoint; the sky limit z->inf is included when the
    skydome redistributes).  Call EAGERLY (host numpy) before jit.
    """
    from ..optics import thinlens

    centers = np.asarray(scene.centers, np.float64)
    radii = np.asarray(scene.radii, np.float64)
    dist = np.linalg.norm(centers, axis=-1)
    z_candidates = np.concatenate([dist - radii, dist + radii])
    z_candidates = np.maximum(z_candidates, 1e-3) * float(
        cfg.unit_scale_filter)
    if cfg.enable_skydome:
        z_candidates = np.concatenate([z_candidates, [1e12]])
    kw = {}
    if po_state is not None:
        kw = dict(aperture_radius=po_state.aperture_radius,
                  focus_distance=po_state.focus_distance)
    coc = np.asarray(
        thinlens.coc_thinlens(cfg, jnp.asarray(-z_candidates, jnp.float32),
                              **kw)
    )
    # coc is a DIAMETER in frame-height units (pixel diameter = coc * yres,
    # ref src/lentil_filter.cpp:177); a splat lands within one RADIUS of
    # its source pixel
    halo = int(np.ceil(float(np.max(coc)) * 0.5 * rc.yres * margin)) + 2
    return halo


def _shard_stream(stream: dict, n_shards: int, idx):
    """Slice a flat sample stream into this device's contiguous chunk."""
    total = stream["px"].shape[0]
    assert total % n_shards == 0, (total, n_shards)
    chunk = total // n_shards
    start = idx * chunk
    return {k: jax.lax.dynamic_slice_in_dim(v, start, chunk, 0) for k, v in stream.items()}


def render_frame_sharded(cfg: CameraConfig, rc: RenderConfig, scene,
                         cam_to_world, mesh: Mesh, seed: int = 0,
                         po_lens=None, po_state=None,
                         use_pallas: bool = True, aovs=None,
                         halo_rows: int | None = None):
    """Full bidirectional render with rays sharded over ``mesh``.

    Each shard traces + shades + splats its slice of the sample stream (a
    contiguous band of frame rows) into a full-frame partial buffer.  The
    merge is **tile-sharded**: ``psum_scatter`` over the row dimension hands
    each shard the summed tile it owns — total merge traffic is O(frame)
    per AOV (a reduce-scatter over ICI) instead of the O(frame x n_shards)
    a full-frame ``psum`` replication costs.  Because a shard's sample rows
    coincide with its result tile, everything except backward-splat energy
    that crosses tile boundaries is an on-shard contribution — the splat
    halo is the only genuinely communicating traffic (the TPU analog of
    the reference's threads writing outside their own bucket into the
    shared buffer, src/lentil.h:100-103).

    **Halo-bounded exchange** (SURVEY §7.8d): when ``halo_rows`` is given
    (compute it eagerly with :func:`splat_halo_rows` — the max-CoC bound on
    how far a splat travels), the merge exchanges ONLY the ``halo_rows``-row
    boundary bands via multi-hop ``ppermute`` — ``2 x halo`` rows of
    traffic per shard instead of the reduce-scatter's ``(n-1)/n x frame``.
    Engaged when that is actually less traffic (and the hop count fits the
    mesh); otherwise falls back to the reduce-scatter merge.

    The resolve runs tile-local; outputs come back with the row dimension
    sharded over the mesh (``P(axis)``), which XLA assembles into the full
    frame.  Falls back to the replicated-psum merge when the region height
    doesn't divide by the mesh size.
    """
    n_shards = mesh.devices.size
    axis = mesh.axis_names[0]
    tiled = rc.yres_region % n_shards == 0
    tile_h = rc.yres_region // n_shards if tiled else None
    use_halo = (
        halo_rows is not None and tiled and n_shards > 1
        and 2 * halo_rows < (n_shards - 1) * tile_h      # traffic win
        and -(-halo_rows // tile_h) <= n_shards - 1       # hops fit mesh
    )

    def shard_fn(cam_to_world_l, scene_l, po_lens_l):
        po_state_l = po_state  # static per-render state, closed over
        idx = jax.lax.axis_index(axis)
        stream = sampling.frame_samples(rc, seed)
        stream = _shard_stream(stream, n_shards, idx)
        origin_cs, dir_cs, weight = trace_camera_rays(
            cfg, stream, po_lens=po_lens_l, po_state=po_state_l,
            use_pallas=use_pallas,
        )
        origin_ws, dir_ws = _transform_rays(cam_to_world_l, origin_cs, dir_cs)
        shaded = scene_l.shade(origin_ws, dir_ws)
        stream = {
            **stream,
            "rgba": shaded["rgba"] * weight[:, None],
            "z": shaded["z"],
            "P": shaded["P"],
            "raydir": dir_ws,
            "obj_id": shaded["obj_id"],
        }
        fb = splat_frame(
            cfg, rc, scene_l, stream, cam_to_world_l,
            po_lens=po_lens_l, po_state=po_state_l, use_pallas=use_pallas,
            aovs=aovs,
        )
        # merge shards: gaussian-class buffers are plain sums; closest-class
        # buffers are winner-take by depth, so resolve the cross-shard winner
        # (global zmin, ties broken by shard index) before summing
        from ..render.aov import CLOSEST, DEFAULT_AOVS

        specs = DEFAULT_AOVS if aovs is None else aovs

        if use_halo:
            merged = _halo_merge(fb, specs, rc, axis, n_shards, tile_h,
                                 halo_rows, idx)
            return resolve_imager(rc, merged), merged

        def merge(v):
            if tiled:
                return jax.lax.psum_scatter(
                    v, axis, scatter_dimension=0, tiled=True
                )
            return jax.lax.psum(v, axis)

        merged = {}
        if "zmin" in fb:
            # winner selection is discrete: stop gradients so the collective
            # min ops never see tangents (pmin has no differentiation rule)
            local_zmin = jax.lax.stop_gradient(fb["zmin"])
            global_zmin = jax.lax.pmin(local_zmin, axis)
            has_min = local_zmin <= global_zmin
            my_idx = jax.lax.axis_index(axis)
            winner_shard = jax.lax.pmin(
                jnp.where(has_min, my_idx, jnp.int32(2**30)), axis
            )
            keep = (has_min & (my_idx == winner_shard)).astype(
                fb["RGBA"].dtype
            )[..., None]
            if tiled:
                merged["zmin"] = jax.lax.dynamic_slice_in_dim(
                    global_zmin, idx * tile_h, tile_h, 0
                )
            else:
                merged["zmin"] = global_zmin

        for k2, v in fb.items():
            if k2 == "zmin":
                continue
            elif any(s.name == k2 and s.filter == CLOSEST for s in specs):
                merged[k2] = merge(v * keep)
            else:
                merged[k2] = merge(v)
        return resolve_imager(rc, merged), merged

    out_spec = P(axis) if tiled else P()
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )
    return fn(cam_to_world, scene, po_lens)


def merge_traffic_bytes(rc: RenderConfig, n_shards: int,
                        n_channels: int, halo_rows: int | None) -> int:
    """Analytic per-shard merge traffic of one sharded frame.

    ``n_channels`` = total framebuffer channels (e.g. DEFAULT_AOVS: RGBA 4
    + 5 closest planes x 4 + filter_weight 1 + zmin 1 = 26).  Reduce-
    scatter moves ``(n-1)/n x frame`` per shard; the halo exchange moves
    two ``halo x width`` bands regardless of frame height — the measured
    reduction VERDICT r3 item 4 asks for is this ratio (both forms are
    exact, so the ratio is pure savings).
    """
    frame = rc.yres_region * rc.xres_region * n_channels * 4
    if halo_rows is None:
        return int(frame * (n_shards - 1) / n_shards)
    return int(2 * halo_rows * rc.xres_region * n_channels * 4)


def _halo_merge(fb: dict, specs, rc: RenderConfig, axis: str,
                n_shards: int, tile_h: int, halo: int, idx):
    """Merge row-sharded partial framebuffers by exchanging ONLY the
    ``halo`` rows that cross tile boundaries — multi-hop ``ppermute``
    bands instead of a full-frame reduce-scatter.

    A splat lands at most one max-CoC radius from its source pixel, so
    shard ``i``'s partial buffer is zero outside rows
    ``[i*tile_h - halo, (i+1)*tile_h + halo)``.  Hop ``k`` exchanges the
    slice of that reach overlapping the ``k``-th neighbor's tile (the
    last hop is a partial band), so total merge traffic is EXACTLY
    ``2 x halo`` rows per shard versus ``(n-1)/n x frame`` for the
    reduce-scatter (SURVEY §7.8d; the reference's analog is a filter
    thread writing just past its bucket into the shared buffer,
    src/lentil.h:100-103).

    Gaussian-class planes halo-ADD (non-reached terms are zero, so the
    result is bit-identical to the reduce-scatter merge); closest-class
    planes halo-SELECT: candidates fold in ascending shard id with
    strict-< depth updates, reproducing the replicated merge's
    lowest-shard-wins-ties semantics exactly.
    """
    from ..render.aov import CLOSEST

    big = jnp.asarray(3e38, jnp.float32)
    closest_names = {s.name for s in specs if s.filter == CLOSEST}
    n_hops = -(-halo // tile_h)
    # hop k (1-based) carries min(tile_h, halo - (k-1)*tile_h) rows
    sizes = [min(tile_h, halo - (k - 1) * tile_h)
             for k in range(1, n_hops + 1)]
    pad_rows = (n_hops + 1) * tile_h

    def band(v, start_row, rows, fill=0.0):
        """Rows [start_row, start_row + rows) of the full-frame partial,
        tolerant of out-of-range starts (padded view)."""
        pad_width = [(pad_rows, pad_rows)] + [(0, 0)] * (v.ndim - 1)
        vp = jnp.pad(v, pad_width, constant_values=fill)
        return jax.lax.dynamic_slice_in_dim(
            vp, start_row + pad_rows, rows, 0
        )

    def from_lower(b, k):
        """Receive shard idx-k's band (every shard sends to idx+k)."""
        return jax.lax.ppermute(
            b, axis, [(i, i + k) for i in range(n_shards - k)]
        )

    def from_upper(b, k):
        return jax.lax.ppermute(
            b, axis, [(i, i - k) for i in range(k, n_shards)]
        )

    t0 = idx * tile_h
    merged = {}

    # --- gaussian planes: multi-hop partial-band adds --------------------
    for nm, v in fb.items():
        if nm == "zmin" or nm in closest_names:
            continue
        acc = band(v, t0, tile_h)
        for k in range(1, n_hops + 1):
            rows = sizes[k - 1]
            # my rows inside shard idx+k's tile -> send down k hops
            send_dn = band(v, (idx + k) * tile_h, rows)
            # my rows at the BOTTOM of shard idx-k's tile -> send up k hops
            send_up = band(v, (idx - k + 1) * tile_h - rows, rows)
            recv_top = from_lower(send_dn, k)   # covers my top rows
            recv_bot = from_upper(send_up, k)   # covers my bottom rows
            # edge shards receive zeros from ppermute -> safe to add
            acc = acc.at[:rows].add(recv_top)
            acc = acc.at[tile_h - rows:].add(recv_bot)
        merged[nm] = acc

    # --- closest planes: ascending-shard-id strict-< folds ---------------
    if "zmin" in fb:
        z = jax.lax.stop_gradient(fb["zmin"])
        closest_items = [(nm, fb[nm]) for nm in fb if nm in closest_names]
        run_z = jnp.full((tile_h,) + z.shape[1:], big, z.dtype)
        run_v = {nm: jnp.zeros((tile_h,) + v.shape[1:], v.dtype)
                 for nm, v in closest_items}

        def expand(m, v):
            while m.ndim < v.ndim:
                m = m[..., None]
            return m

        def fold_top(zc, vc, rows, active):
            nonlocal run_z, run_v
            zc = jnp.where(active, zc, big)
            take = zc < run_z[:rows]
            run_z = run_z.at[:rows].set(jnp.where(take, zc, run_z[:rows]))
            for nm in run_v:
                t = expand(take, run_v[nm])
                run_v[nm] = run_v[nm].at[:rows].set(
                    jnp.where(t, vc[nm], run_v[nm][:rows])
                )

        def fold_bot(zc, vc, rows, active):
            nonlocal run_z, run_v
            zc = jnp.where(active, zc, big)
            s = tile_h - rows
            take = zc < run_z[s:]
            run_z = run_z.at[s:].set(jnp.where(take, zc, run_z[s:]))
            for nm in run_v:
                t = expand(take, run_v[nm])
                run_v[nm] = run_v[nm].at[s:].set(
                    jnp.where(t, vc[nm], run_v[nm][s:])
                )

        # shards idx-n_hops .. idx-1 (ascending id), then me, then
        # idx+1 .. idx+n_hops — strict < everywhere = lowest id wins ties
        for k in range(n_hops, 0, -1):
            rows = sizes[k - 1]
            zc = from_lower(band(z, (idx + k) * tile_h, rows, big), k)
            vc = {nm: from_lower(band(v, (idx + k) * tile_h, rows), k)
                  for nm, v in closest_items}
            fold_top(zc, vc, rows, idx >= k)
        # me (full tile)
        z_me = band(z, t0, tile_h, big)
        v_me = {nm: band(v, t0, tile_h) for nm, v in closest_items}
        take_me = z_me < run_z
        run_z = jnp.where(take_me, z_me, run_z)
        for nm in run_v:
            t = expand(take_me, run_v[nm])
            run_v[nm] = jnp.where(t, v_me[nm], run_v[nm])
        for k in range(1, n_hops + 1):
            rows = sizes[k - 1]
            start = (idx - k + 1) * tile_h - rows
            zc = from_upper(band(z, start, rows, big), k)
            vc = {nm: from_upper(band(v, start, rows), k)
                  for nm, v in closest_items}
            fold_bot(zc, vc, rows, idx < n_shards - k)

        merged["zmin"] = run_z
        for nm, _ in closest_items:
            merged[nm] = run_v[nm]
    return merged


def train_step_sharded(cfg: CameraConfig, rc: RenderConfig, scene,
                       cam_to_world, mesh: Mesh, target_image,
                       po_lens, po_state, seed: int = 0, aovs=None):
    """One differentiable optimization step over the lens polynomial coeffs.

    The full differentiable pipeline of BASELINE config #5: render the frame
    with rays sharded over the mesh, L2 loss against a target image, and
    gradients w.r.t. the polynomial coefficients (psum'd automatically by
    the shard_map transpose).  Returns (loss, grads pytree like
    (pt_coeffs, ap_coeffs)).
    """

    def loss_fn(coeffs, scene_l, cam_l, target_l):
        lens = jax.tree_util.tree_map(lambda x: x, po_lens)
        import dataclasses as dc
        lens = dc.replace(
            lens,
            pt=dc.replace(lens.pt, coeffs=coeffs[0]),
            ap=dc.replace(lens.ap, coeffs=coeffs[1]),
        )
        img, _ = render_frame_sharded(
            cfg, rc, scene_l, cam_l, mesh, seed=seed,
            po_lens=lens, po_state=po_state,
            use_pallas=False,  # grads w.r.t. coeffs need the pure path
            aovs=aovs,
        )
        return jnp.mean((img - target_l) ** 2)

    coeffs = (po_lens.pt.coeffs, po_lens.ap.coeffs)
    # jit the whole step: the eager path dispatches the grad(shard_map(...))
    # graph op-by-op (minutes on CPU hosts); one compile + one run instead
    step = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = step(coeffs, scene, cam_to_world, target_image)
    return loss, grads
