"""Stage breakdown of the 4K differentiable step (BASELINE config 5).

Times jax.grad through progressively larger graph slices:

  fwd_g     loss on the forward trace+shade only (no splat)
  splat_g   loss through the splat with a stop_gradient'd stream
  full      the bench's loss (trace + splat, full AOVs)
  full_rgba same with an RGBA-only AOV list
"""
import dataclasses as dc
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
from pota_tpu.render.aov import AOVSpec, GAUSSIAN
from pota_tpu.render.renderer import look_at, render_sample_stream
from pota_tpu.render.splat import resolve_imager, splat_frame

FLAGSHIP = "angenieux__double_gauss__1953__49mm"
RES = (3840, 2160) if "--4k" in sys.argv else (1920, 1080)
CHUNKS = 32 if "--4k" in sys.argv else 16

poly = get_or_fit_lens(FLAGSHIP)
scene = sc.teapot_scene()
m = look_at([0, 0, 0], [0, 0, -1])
cfg = CameraConfig(
    camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
    fstop=2.8, focus_distance=20.0, vignetting_retries=2,
    splat_queue_mult=4, splat_chunks=CHUNKS, trace_chunks=CHUNKS,
    differentiate_splat_geometry=True,
)
state = setup_po_camera(poly, cfg)
rc = RenderConfig(xres=RES[0], yres=RES[1], spp=1)
RGBA_ONLY = (AOVSpec("RGBA", "RGBA", GAUSSIAN, "rgba"),)


def timeit(name, f, *a, iters=2):
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*a))
    print(f"{name} compile+1: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:10s}: {dt*1e3:8.1f} ms", flush=True)
    return out


def with_coeffs(coeffs):
    return dc.replace(poly, pt=dc.replace(poly.pt, coeffs=coeffs))


def fwd_loss(coeffs):
    stream = render_sample_stream(cfg, rc, scene, m, 0,
                                  po_lens=with_coeffs(coeffs),
                                  po_state=state, use_pallas=False)
    return jnp.mean(stream["rgba"][:, :3])


def splat_loss(coeffs):
    stream = render_sample_stream(cfg, rc, scene, m, 0, po_lens=poly,
                                  po_state=state, use_pallas=False)
    stream = jax.tree_util.tree_map(jax.lax.stop_gradient, stream)
    fb = splat_frame(cfg, rc, scene, stream, m,
                     po_lens=with_coeffs(coeffs), po_state=state,
                     use_pallas=False)
    return jnp.mean(resolve_imager(rc, fb)[..., :3])


def full_loss(coeffs, aovs):
    p2 = with_coeffs(coeffs)
    stream = render_sample_stream(cfg, rc, scene, m, 0, po_lens=p2,
                                  po_state=state, use_pallas=False)
    fb = splat_frame(cfg, rc, scene, stream, m, po_lens=p2, po_state=state,
                     use_pallas=False, aovs=aovs)
    return jnp.mean(resolve_imager(rc, fb)[..., :3])


c0 = poly.pt.coeffs
timeit("fwd_g", jax.jit(jax.grad(fwd_loss)), c0)
timeit("splat_g", jax.jit(jax.grad(splat_loss)), c0)
timeit("full", jax.jit(jax.grad(lambda c: full_loss(c, None))), c0)
timeit("full_rgba", jax.jit(jax.grad(lambda c: full_loss(c, RGBA_ONLY))), c0)
