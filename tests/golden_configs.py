"""Shared definitions of the golden-image acceptance configs.

Used by scripts/make_goldens.py (writer) and tests/test_goldens.py (gate).
Five fixed CPU-friendly configs spanning the pipeline: thin-lens bidir,
PO bidir, image-bokeh aperture, chromatic thin-lens, and AOVs+id-matte.
The committed EXRs live in tests/goldens/ (uncompressed float32 scanline,
pota_tpu.io.exr).

The reference's de-facto acceptance test is exactly this pattern: fixed
scenes diffed as images (/root/reference/tests/website_comparison_images/,
tests/cuda/sampledata.txt replay).
"""
import dataclasses as dc
import os

import numpy as np
import jax.numpy as jnp

from pota_tpu import CameraConfig, CameraType, RenderConfig
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_frame

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
M = look_at([0, 0, 0], [0, 0, -1])
FLAGSHIP = "angenieux__double_gauss__1953__49mm"


def _emitter(x=0.0, y=0.0, z=-45.0, radius=1.0, emission=40.0):
    return sc.SphereScene(
        centers=jnp.asarray([[x, y, z]]),
        radii=jnp.asarray([radius]),
        emission=jnp.full((1, 3), emission),
        albedo=jnp.zeros((1, 3)),
        sky_color=jnp.zeros((3,)),
        light_dir=jnp.asarray([0.0, 1.0, 0.0]),
        light_color=jnp.zeros((3,)),
    )


def _bokeh_ring_cdf():
    """Procedural ring aperture (no texture file needed)."""
    from pota_tpu.render.bokeh_image import build_bokeh_cdf

    n = 32
    yy, xx = np.mgrid[0:n, 0:n]
    r = np.sqrt((xx - (n - 1) / 2) ** 2 + (yy - (n - 1) / 2) ** 2) / (n / 2)
    ring = ((r > 0.55) & (r < 0.95)).astype(np.float32)
    return build_bokeh_cdf(np.stack([ring] * 3, -1))


def _po(cfg_kw=None):
    from pota_tpu.optics.fit import load_poly_lens
    from pota_tpu.optics.focus import setup_po_camera

    poly = load_poly_lens(FLAGSHIP, degree=5)
    assert poly is not None
    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
        fstop=2.8, focus_distance=20.0, vignetting_retries=2,
        splat_queue_mult=6, **(cfg_kw or {}),
    )
    return cfg, poly, setup_po_camera(poly, cfg)


def render_thinlens_teapot():
    cfg = CameraConfig(focal_length=50.0, fstop=1.4, focus_distance=150.0,
                       vignetting_retries=2, splat_queue_mult=6)
    rc = RenderConfig(xres=64, yres=64, spp=4)
    img, _ = render_frame(cfg, rc, sc.teapot_scene(), M, seed=0)
    return {"rgba": np.asarray(img)}


def render_po_lightgrid():
    cfg, poly, state = _po()
    rc = RenderConfig(xres=48, yres=48, spp=2)
    scene = sc.lightgrid_scene(n=3, spacing=18.0, z=-150.0, radius=1.0,
                               intensity=40.0)
    img, _ = render_frame(cfg, rc, scene, M, seed=0, po_lens=poly,
                          po_state=state)
    return {"rgba": np.asarray(img)}


def render_bokeh_image_aperture():
    cfg = CameraConfig(
        focal_length=65.0, fstop=1.8, focus_distance=15.0,
        vignetting_retries=2, splat_queue_mult=6, bokeh_enable_image=True,
    )
    rc = RenderConfig(xres=48, yres=48, spp=4)
    img, _ = render_frame(cfg, rc, _emitter(), M, seed=0,
                          bokeh_cdf=_bokeh_ring_cdf())
    return {"rgba": np.asarray(img)}


def render_thinlens_chromatic():
    cfg = CameraConfig(focal_length=65.0, fstop=1.8, focus_distance=15.0,
                       abb_chromatic=1.0, vignetting_retries=2,
                       splat_queue_mult=6)
    rc = RenderConfig(xres=48, yres=48, spp=4)
    img, _ = render_frame(cfg, rc, _emitter(x=4.0), M, seed=0)
    return {"rgba": np.asarray(img)}


def render_bidir_aovs():
    cfg = CameraConfig(focal_length=50.0, fstop=1.4, focus_distance=150.0,
                       vignetting_retries=2, splat_queue_mult=6)
    rc = RenderConfig(xres=48, yres=48, spp=4, enable_id_matte=True)
    img, fb = render_frame(cfg, rc, sc.teapot_scene(), M, seed=0)
    return {
        "rgba": np.asarray(img),
        "Z": np.asarray(fb["Z"][..., 0]),
        "debug": np.asarray(fb["lentil_debug"][..., 0]),
        "crypto_total": np.asarray(fb["crypto_total"]),
    }


GOLDENS = {
    "thinlens_teapot": render_thinlens_teapot,
    "po_lightgrid": render_po_lightgrid,
    "bokeh_image_aperture": render_bokeh_image_aperture,
    "thinlens_chromatic": render_thinlens_chromatic,
    "bidir_aovs": render_bidir_aovs,
}


def planes_to_channels(planes: dict) -> dict:
    """Flatten named planes to EXR channels (RGBA -> name.R ... )."""
    channels = {}
    for name, arr in planes.items():
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 2:
            channels[name] = arr
        else:
            for i, suffix in enumerate("RGBA"[: arr.shape[-1]]):
                channels[f"{name}.{suffix}"] = arr[..., i]
    return channels


def golden_path(key: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{key}.exr")
