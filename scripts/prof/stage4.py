"""Round-4 stage timing: fused splat kernel + sorted accumulator pipeline."""
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
from pota_tpu.ops.po_pallas import resolve_splat_kernel, splat_kernel_params
from pota_tpu.ops.splat_accum import accumulate_sorted

FLAGSHIP = "angenieux__double_gauss__1953__49mm"

poly = get_or_fit_lens(FLAGSHIP)
cfg = CameraConfig(
    camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
    fstop=2.8, focus_distance=20.0, vignetting_retries=3,
    splat_queue_mult=8, splat_chunks=16,
)
scene = sc.lightgrid_scene(n=5, spacing=12.0, z=-150.0, radius=0.8,
                           intensity=40.0)
state = setup_po_camera(poly, cfg, scene=scene)
rc = RenderConfig(xres=1920, yres=1080, spp=1)
m = look_at([0, 0, 0], [0, 0, -1])


def timeit(name, f, *a, iters=3):
    t0 = time.perf_counter()
    out = f(*a)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.asarray(leaves[0]).ravel()[0])
    print(f"{name} compile+1: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.asarray(leaves[0]).ravel()[0])
    print(f"{name:16s}: {(time.perf_counter()-t0)/iters*1e3:8.1f} ms",
          flush=True)
    return out


fwd = jax.jit(lambda _: render_sample_stream(cfg, rc, scene, m, 0,
                                             po_lens=poly, po_state=state))
stream = jax.block_until_ready(fwd(0))
n = stream["rgba"].shape[0]
s_cap = cfg.splat_queue_mult * n
kern = resolve_splat_kernel(poly, cfg.lt_newton_iterations, scene.n_objects)
assert kern is not None
params = splat_kernel_params(cfg, rc, state, m)
spheres = jnp.concatenate([scene.centers, scene.radii[:, None]], -1)


def queue_stage(stream):
    w2c = sp.world_to_camera(m)
    p_cam = (jnp.matmul(stream["P"], w2c[:3, :3].T) + w2c[:3, 3]) * cfg.unit_scale_filter
    redistribute, budget, coc, _ = sp.compute_gates_and_budget(
        cfg, rc, stream, p_cam, po_lens=poly, po_state=state)
    src, lane, slot_on, granted = sp.splat_queue(budget, redistribute, 1, s_cap)
    return p_cam, redistribute, src, lane, slot_on, granted


qs = jax.jit(queue_stage)
timeit("queue", qs, stream)
p_cam, redistribute, src, lane, slot_on, granted = jax.block_until_ready(qs(stream))


def fused_stage(stream, p_cam, redistribute, src, lane):
    counter = lane.astype(jnp.uint32)
    seeds = (stream["px"].astype(jnp.uint32) * stream["py"].astype(jnp.uint32)
             + stream["px"].astype(jnp.uint32))
    p_cam_safe = jnp.where(redistribute[:, None], p_cam,
                           jnp.asarray([0.0, 0.0, -100.0], p_cam.dtype))
    p_cam_q = p_cam_safe[src]
    sky = (stream["z"] >= 1e29)
    aperture, lam_q, rgb_w = sp._po_aperture_lambda(cfg, state, seeds[src], counter)
    p_ws_q = stream["P"][src]
    sky_q = sky[src].astype(jnp.float32)
    lin, ok = sp._map_chunks(
        lambda pc, pw, ap, lm, sk: kern(
            pc[..., 0], pc[..., 1], pc[..., 2],
            pw[..., 0], pw[..., 1], pw[..., 2],
            ap[..., 0], ap[..., 1], lm, sk, params, spheres),
        cfg.splat_chunks, p_cam_q, p_ws_q, aperture, lam_q, sky_q)
    return lin, ok


fs = jax.jit(fused_stage)
timeit("fused_project", fs, stream, p_cam, redistribute, src, lane)
lin, ok = jax.block_until_ready(fs(stream, p_cam, redistribute, src, lane))
valid = jax.block_until_ready(jax.jit(
    lambda ok, so, rd: so & ok & rd[src])(ok, slot_on, redistribute))
print("valid frac:", float(valid.mean()), "count:", int(valid.sum()),
      flush=True)

# writer arrays at real scale
rng = jax.random.PRNGKey(0)
npix = rc.xres * rc.yres
wtot = s_cap + n
w_pix = jnp.concatenate([lin, stream["py"] * rc.xres + stream["px"]])
w_valid = jnp.concatenate([valid, jnp.ones((n,), bool)])
w_pix_s = jnp.where(w_valid, w_pix, npix)
depth = jnp.concatenate([jnp.abs(stream["z"])[src], jnp.abs(stream["z"])])
payload = jax.random.uniform(rng, (wtot, 5), jnp.float32)
sid = jnp.concatenate([src, jnp.arange(n, dtype=jnp.int32)])


def sort_only(pix, dep):
    perm0 = jnp.arange(wtot, dtype=jnp.int32)
    return jax.lax.sort((pix, dep, perm0), num_keys=2, is_stable=True)


so = jax.jit(sort_only)
timeit("sort", so, w_pix_s, depth)
sp_, sd_, perm = jax.block_until_ready(so(w_pix_s, depth))

timeit("gather_payload", jax.jit(lambda p, pm: p[pm]), payload, perm)

timeit("accum_full", jax.jit(
    lambda a, b, c, d: accumulate_sorted(a, b, c, d, npix)),
    w_pix_s, depth, payload, sid)

# full filter stage exactly as bench measures it
from pota_tpu.render.splat import resolve_aovs, splat_frame

def _splat_full(s):
    fb = splat_frame(cfg, rc, scene, s, m, po_lens=poly, po_state=state,
                     with_diagnostics=True)
    return resolve_aovs(rc, fb), fb["_n_valid_splats"]


spl = jax.jit(_splat_full)
out = timeit("splat_full", spl, stream)
print("n_valid:", int(jax.block_until_ready(out[1])), flush=True)
