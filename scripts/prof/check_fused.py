"""On-TPU parity + timing of the fused splat kernel & sorted accumulator.

Parity A/B at 256x256: fused kernel vs the decomposed path (backward
kernel + outside occlusion/mapping) — both share the same Newton solve, so
differences are confined to boundary rounding flips.  Then times the 1080p
bench config end-to-end on the final path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from pota_tpu import CameraConfig, CameraType, RenderConfig
from pota_tpu.optics.fit import get_or_fit_lens
from pota_tpu.optics.focus import setup_po_camera
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_frame
from pota_tpu.render.splat import resolve_aovs

FLAGSHIP = "angenieux__double_gauss__1953__49mm"

poly = get_or_fit_lens(FLAGSHIP)
cfg = CameraConfig(
    camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
    fstop=2.8, focus_distance=20.0, vignetting_retries=3,
    splat_queue_mult=8, splat_chunks=4,
)
scene = sc.lightgrid_scene(n=5, spacing=12.0, z=-150.0, radius=0.8,
                           intensity=40.0)
state = setup_po_camera(poly, cfg, scene=scene)
m = look_at([0, 0, 0], [0, 0, -1])
rc = RenderConfig(xres=256, yres=256, spp=2)


def run(fused):
    f = jax.jit(lambda _: render_frame(cfg, rc, scene, m, seed=0,
                                       po_lens=poly, po_state=state,
                                       fused_splat=fused))
    img, fb = jax.block_until_ready(f(0))
    aovs = jax.block_until_ready(
        jax.jit(lambda _: resolve_aovs(
            rc, render_frame(cfg, rc, scene, m, seed=0, po_lens=poly,
                             po_state=state, fused_splat=fused)[1]))(0))
    return np.asarray(img), {k: np.asarray(v) for k, v in aovs.items()}


img_new, aov_new = run(True)
img_old, aov_old = run(False)

d = np.abs(img_new - img_old)
rel = d.max() / max(np.abs(img_old).max(), 1e-9)
print(f"beauty: max abs diff {d.max():.3e}  rel {rel:.3e}  "
      f"energy new/old {img_new.sum()/img_old.sum():.6f}", flush=True)
for k in aov_old:
    dn, do = aov_new[k], aov_old[k]
    dd = np.abs(dn - do)
    nz = np.abs(do).max()
    print(f"{k:14s} max abs diff {dd.max():.3e} (scale {nz:.3e}) "
          f"mismatched px {(dd.max(-1) > 1e-3 * max(nz,1)).mean():.5f}",
          flush=True)

# ---- timing at bench scale ------------------------------------------------
cfg_big = CameraConfig(
    camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
    fstop=2.8, focus_distance=20.0, vignetting_retries=3,
    splat_queue_mult=8, splat_chunks=16,
)
state_big = setup_po_camera(poly, cfg_big, scene=scene)
rc_big = RenderConfig(xres=1920, yres=1080, spp=1)


def timeit(name, fused=True, iters=3):
    f = jax.jit(lambda _: resolve_aovs(
        rc_big, render_frame(cfg_big, rc_big, scene, m, seed=0,
                             po_lens=poly, po_state=state_big,
                             fused_splat=fused)[1]))
    t0 = time.perf_counter()
    out = f(0)
    float(jnp.asarray(out["RGBA"]).ravel()[0])
    print(f"{name} compile+1: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(0)
        float(jnp.asarray(out["RGBA"]).ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)


timeit("e2e fused+sorted", True)
timeit("e2e decomposed  ", False)
