"""Render-region support + cross-pixel gaussian passthrough filtering.

Region contract (ref src/lentil.h:1061-1080 + src/lentil_filter.cpp:97-99):
samples are seeded by *absolute* pixel and mapped in full-frame NDC, so a
region render reproduces exactly the same sample stream as the matching
full-frame pixels; buffers are region-sized.

Footprint contract (ref filter_gaussian_complete, src/lentil.h:736-775):
with filter_width 1.5 a sample contributes to every pixel center within
0.75 px — i.e. across pixel borders.
"""
import dataclasses as dc

import numpy as np
import jax.numpy as jnp

from pota_tpu import CameraConfig, RenderConfig
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_frame, resolve_gaussian

M = look_at([0, 0, 0], [0, 0, -1])


def _mini_scene():
    return sc.SphereScene(
        centers=jnp.asarray([[0.0, 0.0, -45.0]]),
        radii=jnp.asarray([1.5]),
        emission=jnp.asarray([[30.0, 30.0, 30.0]]),
        albedo=jnp.zeros((1, 3)),
        sky_color=jnp.full((3,), 0.05),
        light_dir=jnp.asarray([0.0, 1.0, 0.0]),
        light_color=jnp.zeros((3,)),
    )


def test_region_crop_matches_full_frame():
    """A render region reproduces the matching full-frame pixels.

    The emitter's bokeh disc sits fully inside the region so no
    redistribution energy crosses the region boundary; the 1 px border is
    excluded because the full frame's passthrough filter footprint sees
    out-of-region samples there (exactly like the reference, whose filter
    only ever receives in-region samples)."""
    cfg = CameraConfig(
        focal_length=65.0, fstop=2.8, focus_distance=15.0,
        vignetting_retries=1, splat_queue_mult=6,
    )
    rc_full = RenderConfig(xres=48, yres=48, spp=4)
    rc_region = dc.replace(
        rc_full, region_min_x=8, region_min_y=8,
        region_max_x=39, region_max_y=39,
    )
    scene = _mini_scene()
    img_full, _ = render_frame(cfg, rc_full, scene, M, seed=0)
    img_reg, _ = render_frame(cfg, rc_region, scene, M, seed=0)
    a = np.asarray(img_full)[8:40, 8:40]
    b = np.asarray(img_reg)
    assert b.shape == (32, 32, 4)
    np.testing.assert_allclose(b[1:-1, 1:-1], a[1:-1, 1:-1],
                               rtol=1e-5, atol=1e-6)


def test_gaussian_footprint_crosses_pixel_borders():
    """A bright sample near a pixel border bleeds into the neighbor pixel
    under the 1.5-wide gaussian, and not under a 1.0-wide box-ish filter."""
    rc = RenderConfig(xres=4, yres=1, spp=1, enable_redistribution=False)
    n = 4
    stream = {
        "ox": jnp.asarray([0.49, 0.0, 0.0, 0.0]),
        "oy": jnp.zeros((n,)),
        "rgba": jnp.asarray(
            [[100.0, 0.0, 0.0, 1.0]] + [[0.0, 0.0, 0.0, 0.0]] * 3
        ),
    }
    img = np.asarray(resolve_gaussian(rc, stream))  # [1, 4, 4]
    # pixel 1's center is 0.51 px from the sample: inside the 0.75 reach
    assert img[0, 1, 0] > 0.0
    # pixel 2 is 1.51 px away: outside any footprint
    assert img[0, 2, 0] == 0.0

    rc_narrow = dc.replace(rc, filter_width=1.0)
    img_n = np.asarray(resolve_gaussian(rc_narrow, stream))
    assert img_n[0, 1, 0] == 0.0


def test_gaussian_footprint_weights_match_reference_formula():
    """Per-contribution weight is exp(-2r), r=(2/width)^2 d^2, cut at r>1
    (ref src/lentil.h:748-756)."""
    rc = RenderConfig(xres=3, yres=1, spp=1, enable_redistribution=False)
    stream = {
        "ox": jnp.asarray([0.3, 0.0, 0.0]),
        "oy": jnp.zeros((3,)),
        "rgba": jnp.asarray(
            [[5.0, 0.0, 0.0, 1.0], [1.0, 0.0, 0.0, 1.0],
             [0.0, 0.0, 0.0, 0.0]]
        ),
    }
    img = np.asarray(resolve_gaussian(rc, stream))
    inv_w2 = (2.0 / 1.5) ** 2

    def w(d):
        r = inv_w2 * d * d
        return 0.0 if r > 1.0 else np.exp(-2.0 * r)

    # pixel 1 receives its own sample (d=0) and pixel 0's (d=0.7)
    expect = (1.0 * w(0.0) + 5.0 * w(0.7)) / (w(0.0) + w(0.7))
    np.testing.assert_allclose(img[0, 1, 0], expect, rtol=1e-5)
