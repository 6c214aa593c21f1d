"""Capture a jax.profiler trace of the flagship splat for op-level timing."""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from pota_tpu import CameraConfig, CameraType, RenderConfig
from pota_tpu.optics.fit import get_or_fit_lens
from pota_tpu.optics.focus import setup_po_camera
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_sample_stream
from pota_tpu.render.splat import resolve_aovs, splat_frame

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

fwd = jax.jit(lambda _: render_sample_stream(cfg, rc, scene, m, 0,
                                             po_lens=poly, po_state=state))
stream = jax.block_until_ready(fwd(0))


def _full(s):
    fb = splat_frame(cfg, rc, scene, s, m, po_lens=poly, po_state=state)
    return resolve_aovs(rc, fb)


spl = jax.jit(_full)
out = jax.block_until_ready(spl(stream))  # compile
float(jnp.asarray(out["RGBA"]).ravel()[0])

logdir = "/tmp/pota_prof"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(2):
        out = spl(stream)
        float(jnp.asarray(out["RGBA"]).ravel()[0])
print("trace captured:", glob.glob(logdir + "/**/*.xplane.pb",
                                   recursive=True), flush=True)
