"""Per-stage timing of the flagship bidir splat (bench config #4).

Carves splat_frame's graph into jitted pieces and times each, so round-4
optimization effort goes where the milliseconds are:

  fwd        render_sample_stream (camera rays + shading)
  queue      gates + budget + slot queue construction
  backproj   po_backward_project over all slots (fused Pallas Newton)
  occl       occlusion probes (analytic scene, [S_chunk x n_spheres])
  success    per-source success counting (cumsum + gathers)
  scatter    gaussian RGBA accumulation (5 columns + source fallback)
  winner     closest-AOV winner machinery (2 scatter-mins + gathers)
  e2e        full splat_frame + resolve_aovs
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from pota_tpu import CameraConfig, CameraType, RenderConfig
from pota_tpu.optics.fit import get_or_fit_lens
from pota_tpu.optics.focus import setup_po_camera
from pota_tpu.render import scene as sc
from pota_tpu.render import splat as sp
from pota_tpu.render.renderer import look_at, render_sample_stream
from pota_tpu.render.splat import resolve_aovs, splat_frame

FLAGSHIP = "angenieux__double_gauss__1953__49mm"

poly = get_or_fit_lens(FLAGSHIP)
cfg = CameraConfig(
    camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
    fstop=2.8, focus_distance=20.0, vignetting_retries=3,
    splat_queue_mult=8, splat_chunks=16,
)
state = setup_po_camera(poly, cfg)
rc = RenderConfig(xres=1920, yres=1080, spp=1)
scene = sc.lightgrid_scene(n=5, spacing=12.0, z=-150.0, radius=0.8,
                           intensity=40.0)
m = look_at([0, 0, 0], [0, 0, -1])


def timeit(name, f, *a, iters=3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*a))
    # force a host sync through a real transfer
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).ravel()[0]) if hasattr(x, "ravel") else x,
        out if isinstance(out, (tuple, list, dict)) else (out,),
    )
    print(f"{name} compile+1: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.asarray(leaves[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:10s}: {dt:8.1f} ms", flush=True)
    return out


fwd = jax.jit(lambda _: render_sample_stream(cfg, rc, scene, m, 0,
                                             po_lens=poly, po_state=state))
stream = timeit("fwd", fwd, 0)
stream = jax.block_until_ready(fwd(0))

n = stream["rgba"].shape[0]
s_cap = cfg.splat_queue_mult * n


def queue_stage(stream):
    w2c = sp.world_to_camera(m)
    p_cam = (jnp.matmul(stream["P"], w2c[:3, :3].T) + w2c[:3, 3]) * cfg.unit_scale_filter
    redistribute, budget, coc, _ = sp.compute_gates_and_budget(
        cfg, rc, stream, p_cam, po_lens=poly, po_state=state)
    src, lane, slot_on, granted = sp.splat_queue(budget, redistribute, 1, s_cap)
    return p_cam, redistribute, src, lane, slot_on, granted


qs = jax.jit(queue_stage)
out_q = timeit("queue", qs, stream)
p_cam, redistribute, src, lane, slot_on, granted = jax.block_until_ready(qs(stream))


def backproj_stage(stream, p_cam, redistribute, src, lane):
    counter = lane.astype(jnp.uint32)
    seeds = (stream["px"].astype(jnp.uint32) * stream["py"].astype(jnp.uint32)
             + stream["px"].astype(jnp.uint32))
    p_cam_safe = jnp.where(redistribute[:, None], p_cam,
                           jnp.asarray([0.0, 0.0, -100.0], p_cam.dtype))
    proj = sp._map_chunks(
        lambda p, s, k: sp.po_backward_project(cfg, rc, poly, state, p, s, k),
        cfg.splat_chunks, p_cam_safe[src], seeds[src], counter)
    return proj


bp = jax.jit(backproj_stage)
proj = timeit("backproj", bp, stream, p_cam, redistribute, src, lane)
proj = jax.block_until_ready(bp(stream, p_cam, redistribute, src, lane))


def occl_stage(stream, proj, src):
    lens_cs = proj["lens_cs"] / cfg.unit_scale_filter
    cam_pos_ws = jnp.matmul(lens_cs, m[:3, :3].T) + m[:3, 3]
    occluded = sp._map_chunks(lambda a, b: scene.occluded(a, b),
                              cfg.splat_chunks, stream["P"][src], cam_pos_ws)
    return occluded


oc = jax.jit(occl_stage)
occluded = timeit("occl", oc, stream, proj, src)
occluded = jax.block_until_ready(oc(stream, proj, src))


def success_stage(slot_on, proj, occluded, redistribute, src, granted):
    xres_r, yres_r = rc.xres_region, rc.yres_region
    in_bounds = ((proj["pixel_x"] >= 0) & (proj["pixel_x"] < xres_r)
                 & (proj["pixel_y"] >= 0) & (proj["pixel_y"] < yres_r)
                 & jnp.isfinite(proj["pixel_x"]) & jnp.isfinite(proj["pixel_y"]))
    valid = slot_on & in_bounds & proj["ov_ok"] & ~occluded & redistribute[src]
    s_q = src.shape[0]
    csum_valid = jnp.cumsum(valid.astype(jnp.int32))
    offs_n = jnp.cumsum(granted)
    starts_n = offs_n - granted
    end_i = jnp.clip(offs_n, 0, s_q) - 1
    start_i = jnp.clip(starts_n, 0, s_q) - 1
    pick = lambda i: jnp.where(i >= 0, csum_valid[jnp.maximum(i, 0)], 0)
    successes = pick(end_i) - pick(start_i)
    return valid, successes


su = jax.jit(success_stage)
vs = timeit("success", su, slot_on, proj, occluded, redistribute, src, granted)
valid, successes = jax.block_until_ready(
    su(slot_on, proj, occluded, redistribute, src, granted))


def scatter_stage(stream, proj, valid, successes, src):
    xres_r, yres_r = rc.xres_region, rc.yres_region
    npix = xres_r * yres_r
    inv_density = 1.0 / rc.spp
    inv_success = jnp.where(successes > 0, 1.0 / successes, 0.0)
    use_source = (~redistribute) | (successes == 0)
    px_s = jnp.clip(jnp.floor(proj["pixel_x"]).astype(jnp.int32), 0, xres_r - 1)
    py_s = jnp.clip(jnp.floor(proj["pixel_y"]).astype(jnp.int32), 0, yres_r - 1)
    lin_splat = py_s * xres_r + px_s
    lin_source = stream["py"] * xres_r + stream["px"]
    w_slot = jnp.where(valid, inv_density * inv_success[src], 0.0)
    w_src = jnp.where(use_source, inv_density, 0.0)
    rgbw = jnp.concatenate([proj["rgb_weight"],
                            jnp.ones_like(proj["rgb_weight"][..., :1])], -1)
    values = stream["rgba"]
    slot_vals = values[src]
    slot_contrib = jnp.concatenate(
        [slot_vals * rgbw * w_slot[..., None], w_slot[..., None]], -1)
    src_contrib = jnp.concatenate([values * w_src[:, None], w_src[:, None]], -1)
    cols = []
    for c in range(5):
        col = jnp.zeros((npix,), jnp.float32)
        col = col.at[lin_splat].add(slot_contrib[:, c])
        col = col.at[lin_source].add(src_contrib[:, c])
        cols.append(col)
    return cols


sc_ = jax.jit(scatter_stage)
timeit("scatter", sc_, stream, proj, valid, successes, src)


def winner_stage(stream, proj, valid, successes, src):
    xres_r, yres_r = rc.xres_region, rc.yres_region
    npix = xres_r * yres_r
    use_source = (~redistribute) | (successes == 0)
    px_s = jnp.clip(jnp.floor(proj["pixel_x"]).astype(jnp.int32), 0, xres_r - 1)
    py_s = jnp.clip(jnp.floor(proj["pixel_y"]).astype(jnp.int32), 0, yres_r - 1)
    lin_splat = py_s * xres_r + px_s
    lin_source = stream["py"] * xres_r + stream["px"]
    writer_pix = jnp.concatenate([lin_splat, lin_source])
    writer_valid = jnp.concatenate([valid, use_source])
    depth_src = jnp.abs(stream["z"])
    writer_depth = jnp.concatenate([depth_src[src], depth_src])
    s_q = src.shape[0]
    big = jnp.asarray(3e38, jnp.float32)
    zmin_buf = jnp.full((npix,), big, jnp.float32)
    zmin_buf = zmin_buf.at[writer_pix].min(
        jnp.where(writer_valid, writer_depth, big))
    is_min = writer_valid & (writer_depth <= zmin_buf[writer_pix])
    imax = jnp.iinfo(jnp.int32).max
    wid = jnp.arange(s_q + n, dtype=jnp.int32)
    winner_buf = jnp.full((npix,), imax, jnp.int32)
    winner_buf = winner_buf.at[writer_pix].min(jnp.where(is_min, wid, imax))
    has_winner = winner_buf != imax
    sample_of_writer = jnp.concatenate([src, jnp.arange(n, dtype=jnp.int32)])
    winner_sample = sample_of_writer[jnp.where(has_winner, winner_buf, 0)]
    outs = [stream["z"][winner_sample], stream["P"][winner_sample]]
    return outs


wi = jax.jit(winner_stage)
timeit("winner", wi, stream, proj, valid, successes, src)

e2e = jax.jit(lambda s: resolve_aovs(
    rc, splat_frame(cfg, rc, scene, s, m, po_lens=poly, po_state=state)))
timeit("e2e", e2e, stream)
