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
                         use_pallas: bool = True, aovs=None):
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

    The resolve runs tile-local; outputs come back with the row dimension
    sharded over the mesh (``P(axis)``), which XLA assembles into the full
    frame.  Falls back to the replicated-psum merge when the region height
    doesn't divide by the mesh size.
    """
    n_shards = mesh.devices.size
    axis = mesh.axis_names[0]
    tiled = rc.yres_region % n_shards == 0

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
                tile_h = rc.yres_region // n_shards
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
