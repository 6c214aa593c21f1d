"""Pixel/sample coordinate generation.

Replaces Arnold's sample iterator + blue-noise lens sampler with a
counter-based scheme: every (pixel, subsample) pair hashes to its jitter and
lens uniforms, so the whole sample stream is a pure function of the frame
seed — reproducible across shards and re-runs (the property the reference
only has on its backward path via tea-seeding, SURVEY.md C9).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import RenderConfig
from ..utils import rng as prng


def screen_coords(rc: RenderConfig, px, py, jx, jy):
    """Map pixel indices + jitter in [0,1) to screen coords.

    Returns (sx, sy) where sx, sy are the camera-shader inputs:
    sx in [-1,1]; sy is pre-divided by the frame aspect ratio, matching the
    inverse of the reference filter's pixel mapping
    (src/lentil_filter.cpp:276-278).
    """
    aspect = rc.xres / rc.yres
    screen_x = 2.0 * (px + jx) / rc.xres - 1.0
    screen_y = 1.0 - 2.0 * (py + jy) / rc.yres
    return screen_x, screen_y / aspect


def pixel_to_linear(rc: RenderConfig, px, py):
    return py * rc.xres + px


def frame_samples(rc: RenderConfig, seed: int):
    """Generate the frame's sample coordinates (render-region aware).

    Returns dict with flattened [N = H_region*W_region*spp] arrays: px, py
    (int32, *absolute* full-frame pixel indices), sx, sy (screen coords in
    full-frame NDC, matching the reference's region handling at
    src/lentil_filter.cpp:97-99 / src/lentil.h:1061-1080), r1, r2 (lens
    uniforms), ox, oy (offset from pixel center, for gaussian filtering).
    """
    h, w, spp = rc.yres_region, rc.xres_region, rc.spp
    px = jnp.tile(
        (rc.region_min_x + jnp.arange(w, dtype=jnp.int32))[None, :, None],
        (h, 1, spp),
    )
    py = jnp.tile(
        (rc.region_min_y + jnp.arange(h, dtype=jnp.int32))[:, None, None],
        (1, w, spp),
    )
    sid = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.uint32), (h, w, spp))

    # seed by *absolute* pixel so a region render reproduces the exact
    # samples of the corresponding full-frame pixels
    linear = (py * rc.xres + px).astype(jnp.uint32)
    key = prng.tea(linear, jnp.uint32(seed))
    u = prng.uniforms(key, sid, 5)  # [h, w, spp, 5]
    jx, jy, r1, r2, tu = (u[..., i] for i in range(5))

    sx, sy = screen_coords(rc, px.astype(jnp.float32), py.astype(jnp.float32), jx, jy)
    flat = lambda a: a.reshape(-1)
    return {
        "px": flat(px),
        "py": flat(py),
        "sid": flat(sid),
        "sx": flat(sx),
        "sy": flat(sy),
        "r1": flat(r1),
        "r2": flat(r2),
        "ox": flat(jx - 0.5),
        "oy": flat(jy - 0.5),
        "key": flat(key),
        "time": flat(tu),
    }
