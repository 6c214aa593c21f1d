"""Per-stage timing of the EXPANDED flagship splat path (r5).

Stages:
  fwd      render_sample_stream
  gates    p_cam transform + gate chain + budget
  queue    splat_queue_compact
  table    cols16 stack + [16, Nt] scatter
  expand   expand kernel (one-hot MXU gather -> [16, S])
  solve    v2 fused splat kernel (sample_aperture mode) on expanded rows
  success  per-source success counting
  prep     w_slot/payload concats
  sortpay  sort_writers_with_payload
  accum    accumulate_presorted
  closest  winner-gather closest AOV planes
  e2e      full splat_frame + resolve_aovs
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
    print(f"{name} compile+1: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:10s}: {dt:8.1f} ms", flush=True)
    return out


fwd = jax.jit(lambda _: render_sample_stream(cfg, rc, scene, m, 0,
                                             po_lens=poly, po_state=state))
stream = timeit("fwd", fwd, 0)
stream = jax.block_until_ready(fwd(0))

n = stream["rgba"].shape[0]
s_cap = cfg.splat_queue_mult * n
dtype = jnp.float32


def gates_stage(stream):
    w2c = sp.world_to_camera(m)
    p_cam = (jnp.matmul(stream["P"], w2c[:3, :3].T,
                        precision=jax.lax.Precision.HIGHEST)
             + w2c[:3, 3]) * cfg.unit_scale_filter
    redistribute, budget, coc, _ = sp.compute_gates_and_budget(
        cfg, rc, stream, p_cam, po_lens=poly, po_state=state)
    p_cam_safe = jnp.where(redistribute[:, None], p_cam,
                           jnp.asarray([0.0, 0.0, -100.0], p_cam.dtype))
    return p_cam_safe, redistribute, budget


g = jax.jit(gates_stage)
out_g = timeit("gates", g, stream)
p_cam_safe, redistribute, budget = jax.block_until_ready(g(stream))

q = jax.jit(lambda b, r: sp.splat_queue_compact(b, r, s_cap))
out_q = timeit("queue", q, budget, redistribute)
src, slot_on, granted = jax.block_until_ready(q(budget, redistribute))

from pota_tpu.ops.po_pallas import (
    TBL_A, TBL_B, TBL_G, TBL_OID, TBL_PCX, TBL_PCY, TBL_PCZ, TBL_PWX,
    TBL_PWY, TBL_PWZ, TBL_PX, TBL_PY, TBL_R, TBL_ROWS, TBL_SKY, TBL_START,
    TBL_Z, _TS_CHUNK, prebuild_splat_kernel, resolve_expand_kernel,
    resolve_splat_kernel, splat_kernel_params,
)

prebuild_splat_kernel(poly, cfg.lt_newton_iterations, scene.n_objects)
exp_kern = resolve_expand_kernel(True)
splat_kern = resolve_splat_kernel(poly, cfg.lt_newton_iterations,
                                  scene.n_objects, True,
                                  sample_aperture=True)


def table_stage(stream, p_cam_safe, granted):
    depth_src = jnp.abs(stream["z"])
    sky = (stream["z"] >= 1e29) | (
        jnp.linalg.norm(stream["P"], axis=-1) < 1e-7)
    slot_vals = stream["rgba"]
    offs_n0 = jnp.cumsum(granted)
    starts_n0 = (offs_n0 - granted).astype(dtype)
    has = granted > 0
    pos = jnp.where(has, jnp.cumsum(has.astype(jnp.int32)) - 1, n)
    cols16 = jnp.stack([
        stream["px"].astype(dtype), stream["py"].astype(dtype),
        p_cam_safe[:, 0], p_cam_safe[:, 1], p_cam_safe[:, 2],
        stream["P"][:, 0], stream["P"][:, 1], stream["P"][:, 2],
        sky.astype(dtype), starts_n0,
        slot_vals[:, 0], slot_vals[:, 1], slot_vals[:, 2], slot_vals[:, 3],
        depth_src, jnp.arange(n, dtype=dtype),
    ], 0)
    nt = -(-n // _TS_CHUNK) * _TS_CHUNK
    return jnp.zeros((TBL_ROWS, nt), dtype).at[:, pos].set(
        cols16, mode="drop")


t = jax.jit(table_stage)
out_t = timeit("table", t, stream, p_cam_safe, granted)
table = jax.block_until_ready(t(stream, p_cam_safe, granted))

tb = (src[::_TS_CHUNK] // _TS_CHUNK).astype(jnp.int32)
ex_f = jax.jit(lambda s, t_, b: exp_kern(s.astype(dtype), t_, b))
out_ex = timeit("expand", ex_f, src, table, tb)
ex = jax.block_until_ready(ex_f(src, table, tb))

params = splat_kernel_params(cfg, rc, state, m)
spheres = jnp.concatenate(
    [scene.centers, scene.radii[:, None]], -1).astype(jnp.float32)


def solve_stage(ex):
    s_q_ = ex.shape[1]
    lane_i = jnp.maximum(
        jnp.arange(s_q_, dtype=jnp.int32) - ex[TBL_START].astype(jnp.int32), 0)
    seed_u = (ex[TBL_PX].astype(jnp.uint32) * ex[TBL_PY].astype(jnp.uint32)
              + ex[TBL_PX].astype(jnp.uint32))
    lam_dummy = jnp.zeros((1, 1), jnp.float32)
    return splat_kern(
        ex[TBL_PCX], ex[TBL_PCY], ex[TBL_PCZ],
        ex[TBL_PWX], ex[TBL_PWY], ex[TBL_PWZ],
        seed_u, lane_i.astype(jnp.uint32), lam_dummy, ex[TBL_SKY],
        params, spheres,
    )


sv = jax.jit(solve_stage)
out_sv = timeit("solve", sv, ex)
lin_splat, ok = jax.block_until_ready(sv(ex))
valid = slot_on & ok
oid = ex[TBL_OID].astype(jnp.int32)
k_z = ex[TBL_Z]
k_r, k_g, k_b, k_a = ex[TBL_R], ex[TBL_G], ex[TBL_B], ex[TBL_A]


def success_stage(valid, granted):
    s_q = valid.shape[0]
    csum_valid = jnp.cumsum(valid.astype(jnp.int32))
    offs_n = jnp.cumsum(granted)
    starts_n = offs_n - granted
    end_i = jnp.clip(offs_n, 0, s_q) - 1
    start_i = jnp.clip(starts_n, 0, s_q) - 1
    pick = lambda i: jnp.where(i >= 0, csum_valid[jnp.maximum(i, 0)], 0)
    return pick(end_i) - pick(start_i)


su = jax.jit(success_stage)
successes = timeit("success", su, valid, granted)
successes = jax.block_until_ready(su(valid, granted))

from pota_tpu.ops.splat_accum import (
    accumulate_presorted, sort_writers_with_payload,
)

npix = rc.xres_region * rc.yres_region
inv_density = 1.0 / rc.spp


def prep_writers(stream, valid, successes, oid, k_z, lin_splat,
                 k_r, k_g, k_b, k_a):
    inv_success = jnp.where(successes > 0, 1.0 / successes, 0.0)
    use_source = (~redistribute) | (successes == 0)
    w_slot = jnp.where(valid, inv_density * inv_success[oid], 0.0)
    w_src = jnp.where(use_source, inv_density, 0.0)
    lin_source = stream["py"] * rc.xres_region + stream["px"]
    writer_pix = jnp.concatenate([lin_splat, lin_source])
    writer_valid = jnp.concatenate([valid, use_source])
    depth_src = jnp.abs(stream["z"])
    writer_depth = jnp.concatenate([k_z, depth_src])
    writer_pix_s = jnp.where(writer_valid, writer_pix, npix)
    values = stream["rgba"]
    cols = [
        jnp.concatenate([k_r * w_slot, values[:, 0] * w_src]),
        jnp.concatenate([k_g * w_slot, values[:, 1] * w_src]),
        jnp.concatenate([k_b * w_slot, values[:, 2] * w_src]),
        jnp.concatenate([k_a * w_slot, values[:, 3] * w_src]),
        jnp.concatenate([w_slot, w_src]),
    ]
    sample_of_writer = jnp.concatenate(
        [oid, jnp.arange(n, dtype=jnp.int32)])
    return writer_pix_s, writer_depth, cols, sample_of_writer


pw = jax.jit(prep_writers)
out_pw = timeit("prep", pw, stream, valid, successes, oid, k_z, lin_splat,
                k_r, k_g, k_b, k_a)
writer_pix_s, writer_depth, cols, sample_of_writer = jax.block_until_ready(
    pw(stream, valid, successes, oid, k_z, lin_splat, k_r, k_g, k_b, k_a))

ss = jax.jit(lambda a, b, c, d: sort_writers_with_payload(a, b, c, d))
out_ss = timeit("sortpay", ss, writer_pix_s, writer_depth, cols,
                sample_of_writer)
sp_, dep_s, cols_s, sid_s, focc = jax.block_until_ready(
    ss(writer_pix_s, writer_depth, cols, sample_of_writer))

ac = jax.jit(lambda a, b, c, d, e: accumulate_presorted(
    a, b, c, d.astype(jnp.float32), e, npix))
out_ac = timeit("accum", ac, sp_, cols_s, dep_s, sid_s, focc)
accum, winner_depth, winner_sample, has_winner = jax.block_until_ready(
    ac(sp_, cols_s, dep_s, sid_s, focc))


def closest_stage(stream, winner_sample, has_winner):
    from pota_tpu.render.aov import CLOSEST, DEFAULT_AOVS, aov_value_rgba
    stream = {**stream,
              "debug": jnp.zeros_like(stream["z"]),
              "time": stream.get("time", jnp.zeros_like(stream["z"]))}
    outs = {}
    for spec in DEFAULT_AOVS:
        if spec.filter != CLOSEST:
            continue
        values = aov_value_rgba(stream, spec)
        px_vals = values[winner_sample] * has_winner[:, None].astype(dtype)
        outs[spec.name] = px_vals.reshape(rc.yres_region, rc.xres_region, 4)
    return outs


cl = jax.jit(closest_stage)
timeit("closest", cl, stream, winner_sample, has_winner)

e2e = jax.jit(lambda s: resolve_aovs(
    rc, splat_frame(cfg, rc, scene, s, m, po_lens=poly, po_state=state)))
timeit("e2e", e2e, stream)
print("path:", sp._LAST_PATH, flush=True)
