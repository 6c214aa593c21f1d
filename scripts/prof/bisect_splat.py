"""DCE bisection of the flagship splat graph: time subsets of outputs."""
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
from pota_tpu.render.renderer import look_at, render_sample_stream
from pota_tpu.render.splat import splat_frame
from pota_tpu.render.aov import DEFAULT_AOVS

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


def timeit(name, f, *a, iters=3):
    t0 = time.perf_counter()
    out = f(*a)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    print(f"{name} compile+1: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    print(f"{name:22s}: {(time.perf_counter()-t0)/iters*1e3:8.1f} ms",
          flush=True)


def fb_subset(keys, aovs=None):
    def f(s):
        fb = splat_frame(cfg, rc, scene, s, m, po_lens=poly, po_state=state,
                        aovs=aovs, with_diagnostics=True)
        return tuple(fb[k] for k in keys if k in fb)
    return jax.jit(f)


RGBA_ONLY = tuple(s for s in DEFAULT_AOVS if s.name == "RGBA")

timeit("n_valid only", fb_subset(("_n_valid_splats",)), stream)
timeit("RGBA buffer only", fb_subset(("RGBA",)), stream)
timeit("RGBA+weight", fb_subset(("RGBA", "filter_weight")), stream)
timeit("winner planes only", fb_subset(("Z", "P")), stream)
timeit("all planes", fb_subset(
    ("RGBA", "filter_weight", "Z", "P", "lentil_raydir", "lentil_time",
     "lentil_debug", "zmin")), stream)
timeit("rgba-only aovlist", fb_subset(("RGBA", "filter_weight"),
                                      aovs=RGBA_ONLY), stream)
