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

FLAGSHIP = "angenieux__double_gauss__1953__49mm"

print("A: accumulate_sorted small on TPU", flush=True)
from pota_tpu.ops.splat_accum import accumulate_sorted

rng = np.random.default_rng(0)
n = 100_000
npix = 64 * 64
pix = rng.integers(0, npix, n).astype(np.int32)
dep = rng.uniform(1, 50, n).astype(np.float32)
pay = rng.normal(size=(n, 5)).astype(np.float32)
sid = rng.integers(0, 1000, n).astype(np.int32)
t0 = time.time()
out = accumulate_sorted(jnp.asarray(pix), jnp.asarray(dep),
                        jnp.asarray(pay), jnp.asarray(sid), npix)
out = jax.block_until_ready(out)
print(f"A ok in {time.time()-t0:.1f}s accum[0,:2]={np.asarray(out[0])[0,:2]}",
      flush=True)
# parity vs numpy
ref = np.zeros((npix, 5))
np.add.at(ref, pix, pay)
err = np.abs(np.asarray(out[0]) - ref).max()
print(f"A parity max err {err:.2e}", flush=True)

print("B: build_po_splat_kernel eager on TPU", flush=True)
from pota_tpu.ops.po_pallas import build_po_splat_kernel, splat_kernel_params

poly = get_or_fit_lens(FLAGSHIP)
cfg = CameraConfig(camera_type=CameraType.POLYNOMIAL_OPTICS,
                   lens_model=FLAGSHIP, fstop=2.8, focus_distance=20.0)
state = setup_po_camera(poly, cfg)
rc = RenderConfig(xres=256, yres=256, spp=1)
t0 = time.time()
kern = build_po_splat_kernel(poly, 5, 25)
m = np.eye(4, dtype=np.float32)
params = splat_kernel_params(cfg, rc, state, m)
spheres = jnp.asarray(rng.uniform(-20, 20, (25, 4)).astype(np.float32))
S = 8192
pc = rng.uniform(-5, 5, (3, S)).astype(np.float32)
pc[2] = -100.0
pw = rng.uniform(-20, 20, (3, S)).astype(np.float32)
ap = rng.uniform(-5, 5, (2, S)).astype(np.float32)
lam = np.full(S, 0.55, np.float32)
sky = np.zeros(S, np.float32)
out = kern(*(jnp.asarray(a) for a in
             (pc[0], pc[1], pc[2], pw[0], pw[1], pw[2], ap[0], ap[1],
              lam, sky)), params, spheres)
out = jax.block_until_ready(out)
print(f"B ok in {time.time()-t0:.1f}s lin[:4]={np.asarray(out[0])[:4]} "
      f"ok frac={np.asarray(out[1]).mean():.3f}", flush=True)
