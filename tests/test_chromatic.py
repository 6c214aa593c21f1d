"""Chromatic-aberration splatting: per-channel bokeh separation.

Thin-lens: one random channel per splat with a channel-shifted focus
distance (ref src/lentil_filter.cpp:392-406).  The shift scales with the
sample's distance from the image center (lateral CA), so the emitter must
sit OFF-AXIS; and the focus-shift effect on bokeh radius goes as
``aperture_radius / focus_distance**2``, so the scene uses a close focus
(15 cm) with the emitter behind it — bokeh disc ~14 px on the 64 px frame,
channel separation ~0.6 px.

Polynomial optics: three wavelength-shifted backward rays per budget unit
with rgb weights (3,0,0)/(0,3,0)/(0,0,3) (ref src/lentil_filter.cpp:255-267)
— real dispersion through the fitted lens separates the channels.
"""
import dataclasses as dc

import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu import CameraConfig, CameraType, RenderConfig
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_frame

RC = RenderConfig(xres=64, yres=64, spp=4)
M = look_at([0, 0, 0], [0, 0, -1])

TL_CFG = dict(
    focal_length=65.0, fstop=1.8, focus_distance=15.0, abb_chromatic=1.0,
    splat_queue_mult=6,
)


def _emitter(x=0.0, y=0.0, z=-400.0, radius=1.0):
    return sc.SphereScene(
        centers=jnp.asarray([[x, y, z]]),
        radii=jnp.asarray([radius]),
        emission=jnp.asarray([[40.0, 40.0, 40.0]]),
        albedo=jnp.zeros((1, 3)),
        sky_color=jnp.zeros((3,)),
        light_dir=jnp.asarray([0.0, 1.0, 0.0]),
        light_color=jnp.zeros((3,)),
    )


def _channel_radii(img):
    """Energy-weighted mean radius (px) around each channel's centroid."""
    img = np.asarray(img)[..., :3]
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    radii = []
    for c in range(3):
        wgt = np.maximum(img[..., c], 0.0)
        tot = wgt.sum()
        assert tot > 0, f"channel {c} received no energy"
        cx = (wgt * xx).sum() / tot
        cy = (wgt * yy).sum() / tot
        r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        radii.append((wgt * r).sum() / tot)
    return radii


def test_thinlens_chromatic_separates_channels():
    cfg = CameraConfig(**TL_CFG)
    cfg0 = dc.replace(cfg, abb_chromatic=0.0)
    scene = _emitter(x=6.0, z=-45.0)
    img, _ = render_frame(cfg, RC, scene, M, seed=0)
    img0, _ = render_frame(cfg0, RC, scene, M, seed=0)
    rr, rg, rb = _channel_radii(img)
    r0 = _channel_radii(img0)
    # the bokeh disc must actually resolve on the frame
    assert r0[1] > 2.0, r0
    # no-chromatic: all channels share one bokeh radius
    assert abs(r0[0] - r0[2]) < 0.1, r0
    # GREEN_MAGENTA: R and B focus-shift together, away from G
    assert abs(rr - rg) > 0.2, (rr, rg, rb)
    assert abs(rb - rg) > 0.2, (rr, rg, rb)
    assert (rr - rg) * (rb - rg) > 0, (rr, rg, rb)


def test_thinlens_red_cyan_shifts_opposite():
    cfg = CameraConfig(**TL_CFG, abb_chromatic_type=1)  # RED_CYAN
    img, _ = render_frame(cfg, RC, _emitter(x=6.0, z=-45.0), M, seed=0)
    rr, rg, rb = _channel_radii(img)
    # R (shift -1) and B (shift +1) move to opposite sides of G
    assert (rr - rg) * (rb - rg) < 0, (rr, rg, rb)
    assert abs(rr - rb) > 0.2, (rr, rg, rb)


@pytest.fixture(scope="module")
def po_setup():
    from pota_tpu.optics.fit import load_poly_lens
    from pota_tpu.optics.focus import setup_po_camera

    name = "angenieux__double_gauss__1953__49mm"
    poly = load_poly_lens(name, degree=5)
    assert poly is not None, "committed flagship fit missing"
    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=name,
        fstop=2.8, focus_distance=20.0, vignetting_retries=2,
        abb_chromatic=0.6, splat_queue_mult=6,
    )
    state = setup_po_camera(poly, cfg)
    return cfg, poly, state


def test_po_chromatic_three_wavelength_splat(po_setup):
    """The PO backward splat traces 3 lambda-shifted rays; dispersion in the
    fitted polynomial separates the channel bokeh (fringing)."""
    cfg, poly, state = po_setup
    img, fb = render_frame(
        cfg, RC, _emitter(z=-150.0), M, seed=0, po_lens=poly, po_state=state
    )
    img = np.asarray(img)
    assert np.isfinite(img).all()
    rr, rg, rb = _channel_radii(img)
    # the bokeh disc must actually resolve on the frame
    assert rg > 1.5, (rr, rg, rb)
    # each channel received comparable total energy (weights 3x on 1/3 slots)
    e = img[..., :3].sum((0, 1))
    assert e.min() > 0.3 * e.max(), e
    # R (0.43um) and B (0.73um) focus differently from G (0.55um)
    assert abs(rr - rb) > 0.05, (rr, rg, rb)


def test_po_monochromatic_has_no_fringing(po_setup):
    cfg, poly, state = po_setup
    cfg0 = dc.replace(cfg, abb_chromatic=0.0)
    img, _ = render_frame(
        cfg0, RC, _emitter(z=-150.0), M, seed=0, po_lens=poly, po_state=state
    )
    rr, rg, rb = _channel_radii(img)
    assert abs(rr - rb) < 0.05, (rr, rg, rb)
