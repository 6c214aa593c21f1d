"""Parity + timing of the table (gather-free) splat path."""
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
    f = jax.jit(lambda _: resolve_aovs(
        rc, render_frame(cfg, rc, scene, m, seed=0, po_lens=poly,
                         po_state=state, fused_splat=fused)[1]))
    return {k: np.asarray(v) for k, v in jax.block_until_ready(f(0)).items()}


aov_new = run(True)    # table path
aov_old = run(False)   # decomposed + sorted

for k in aov_old:
    dn, do = aov_new[k], aov_old[k]
    dd = np.abs(dn - do)
    nz = np.abs(do).max()
    print(f"{k:14s} max abs diff {dd.max():.3e} (scale {nz:.3e}) "
          f"mismatched px {(dd.max(-1) > 1e-3 * max(nz,1)).mean():.5f}",
          flush=True)
e_new = aov_new["RGBA"].sum()
e_old = aov_old["RGBA"].sum()
print(f"energy table/decomposed: {e_new/e_old:.6f}", flush=True)

# ---- timing at bench scale ------------------------------------------------
cfg_big = CameraConfig(
    camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
    fstop=2.8, focus_distance=20.0, vignetting_retries=3,
    splat_queue_mult=8, splat_chunks=16,
)
state_big = setup_po_camera(poly, cfg_big, scene=scene)
rc_big = RenderConfig(xres=1920, yres=1080, spp=1)

f = jax.jit(lambda _: resolve_aovs(
    rc_big, render_frame(cfg_big, rc_big, scene, m, seed=0,
                         po_lens=poly, po_state=state_big)[1]))
t0 = time.perf_counter()
out = f(0)
float(jnp.asarray(out["RGBA"]).ravel()[0])
print(f"e2e table compile+1: {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)
t0 = time.perf_counter()
for _ in range(3):
    out = f(0)
    float(jnp.asarray(out["RGBA"]).ravel()[0])
print(f"e2e table path: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)
