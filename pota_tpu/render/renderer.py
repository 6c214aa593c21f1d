"""End-to-end render pipeline: camera rays -> shading -> filter/resolve.

This is the TPU-native equivalent of the reference's render flow
(zpelgrims/pota): `camera_create_ray` (src/lentil_camera.cpp:78-125) becomes
a batched trace over the whole frame's sample stream; the `lentil_filter` /
`imager_lentil` pair (src/lentil_filter.cpp, src/lentil_imager.cpp) becomes
a scatter-splat + weight-normalize resolve (see render/splat.py).

Rays, shading and splatting are all pure functions of (config, scene, seed),
so the full frame renders inside one ``jax.jit``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CameraConfig, CameraType, RenderConfig
from ..optics import thinlens
from . import sampling


def _transform_rays(cam_to_world, origins, dirs):
    """Apply a 4x4 camera->world transform to ray origins/directions."""
    rot = cam_to_world[:3, :3]
    trans = cam_to_world[:3, 3]
    hp = jnp.matmul  # HIGHEST: bf16 MXU noise (~4e-3 rel) is mm-scale on world coords
    o = hp(origins, rot.T, precision=jax.lax.Precision.HIGHEST) + trans
    d = hp(dirs, rot.T, precision=jax.lax.Precision.HIGHEST)
    d = d / jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1, keepdims=True), 1e-24))
    return o, d


def interp_camera_matrix(m0, m1, t):
    """Per-sample camera matrix over the shutter: linear blend of the two
    key matrices (the reference relies on Arnold's per-time matrices,
    src/lentil_filter.cpp:141-150).  t [N] in [0,1] -> [N, 4, 4]."""
    t = t[:, None, None]
    return m0[None] * (1.0 - t) + m1[None] * t


def _transform_rays_mb(m_per_sample, origins, dirs):
    """Batched per-sample camera->world ray transform."""
    rot = m_per_sample[:, :3, :3]
    trans = m_per_sample[:, :3, 3]
    o = jnp.einsum("nij,nj->ni", rot, origins,
                   precision=jax.lax.Precision.HIGHEST) + trans
    d = jnp.einsum("nij,nj->ni", rot, dirs,
                   precision=jax.lax.Precision.HIGHEST)
    return o, d / jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1, keepdims=True), 1e-24))


def trace_camera_rays(cfg: CameraConfig, samples: dict, po_lens=None,
                      bokeh_cdf=None, po_state=None, use_pallas: bool = True):
    """Generate camera-space rays for a sample stream (dispatch by model).

    Equivalent of camera_create_ray minus the derivative rays (those are
    jvp'd on demand; the reference finite-differences them,
    src/lentil_camera.cpp:96-119).
    """
    if cfg.camera_type == CameraType.THIN_LENS:
        origin, direction, weight, _tries = thinlens.trace_fw_thinlens(
            cfg, samples["sx"], samples["sy"], samples["r1"], samples["r2"],
            retry_key=samples["key"], bokeh_cdf=bokeh_cdf,
        )
    else:
        from ..models.po_camera import trace_fw_po
        assert po_lens is not None, "polynomial camera requires a fitted lens"
        origin, direction, weight, _tries = trace_fw_po(
            cfg, po_lens, samples["sx"], samples["sy"], samples["r1"],
            samples["r2"], retry_key=samples["key"], bokeh_cdf=bokeh_cdf,
            po_state=po_state, use_pallas=use_pallas,
        )
    weight = weight * cfg.exposure  # ref src/lentil_camera.cpp:124
    return origin, direction, weight


def trace_camera_rays_with_derivs(cfg: CameraConfig, rc: RenderConfig,
                                  samples: dict, po_lens=None,
                                  bokeh_cdf=None, po_state=None,
                                  use_pallas: bool = True):
    """Primary rays + ray differentials (camera_create_ray parity).

    The reference traces 2 extra finite-difference rays per camera ray with
    step=0.001 in (sx, sy), reusing the primary's r1/r2 and skipping the
    vignetting retries (``deriv_ray``, ref src/lentil_camera.cpp:96-119).
    TPU-native upgrade: one ``jax.jvp`` per screen axis over the same
    deriv-ray path — exact derivatives at the same cost profile (the jvp
    evaluates primal+tangent together), no step-size noise.

    Tangent magnitude is one pixel's screen-space step (2/xres, 2/yres),
    matching Arnold's per-pixel ``input.dsx/dsy`` scaling, so the outputs
    are dO/dpixel and dD/dpixel.

    Returns (origin, direction, weight, derivs dict with dOdx/dOdy/dDdx/dDdy).
    """
    origin, direction, weight = trace_camera_rays(
        cfg, samples, po_lens=po_lens, bokeh_cdf=bokeh_cdf,
        po_state=po_state, use_pallas=use_pallas,
    )

    r1, r2 = samples["r1"], samples["r2"]

    def deriv_trace(sxy):
        sx, sy = sxy
        if cfg.camera_type == CameraType.THIN_LENS:
            o, d, _, _ = thinlens.trace_fw_thinlens(
                cfg, sx, sy, r1, r2, deriv_ray=True, bokeh_cdf=bokeh_cdf,
            )
        else:
            from ..models.po_camera import trace_fw_po

            o, d, _, _ = trace_fw_po(
                cfg, po_lens, sx, sy, r1, r2, deriv_ray=True,
                bokeh_cdf=bokeh_cdf, po_state=po_state,
                use_pallas=False,  # jvp needs the differentiable pure path
            )
        return o, d

    sx, sy = samples["sx"], samples["sy"]
    step_x = 2.0 / rc.xres
    step_y = 2.0 / rc.yres
    zeros = jnp.zeros_like(sx)
    _, (dOdx, dDdx) = jax.jvp(
        deriv_trace, ((sx, sy),), ((jnp.full_like(sx, step_x), zeros),)
    )
    _, (dOdy, dDdy) = jax.jvp(
        deriv_trace, ((sx, sy),), ((zeros, jnp.full_like(sy, step_y)),)
    )
    return origin, direction, weight, {
        "dOdx": dOdx, "dOdy": dOdy, "dDdx": dDdx, "dDdy": dDdy,
    }


def camera_reverse_ray(cfg: CameraConfig, p_cam, po_lens=None):
    """Camera-space point -> screen coords, pinhole-FOV approximation.

    Port of the reference's active camera_reverse_ray
    (src/lentil_camera.cpp:164-172): ``Ps = Po.xy / max(|Po.z * tan_fov|,
    1e-3)``.  PO cameras use the fitted lens's field of view
    (ref src/lentil.h:1658), thin lens the closed-form sensor FOV
    (ref src/lentil.h:1666).
    """
    import math

    if cfg.camera_type == CameraType.POLYNOMIAL_OPTICS:
        assert po_lens is not None
        tan_fov = math.tan(po_lens.fov / 2.0)
    else:
        tan_fov = cfg.thinlens_tan_fov
    coeff = 1.0 / jnp.maximum(jnp.abs(p_cam[..., 2] * tan_fov), 1e-3)
    return jnp.stack(
        [p_cam[..., 0] * coeff, p_cam[..., 1] * coeff], -1
    )


def render_sample_stream(cfg: CameraConfig, rc: RenderConfig, scene,
                         cam_to_world, seed: int = 0, po_lens=None,
                         bokeh_cdf=None, po_state=None,
                         cam_to_world_end=None,
                         use_pallas: bool = True) -> dict:
    """Trace + shade the whole frame; returns the per-sample AOV stream.

    The stream is the TPU analog of Arnold's AA sample iterator contents:
    rgba, world position P, depth Z, ray direction, per-sample weight, and
    the pixel bookkeeping needed by the filter stage.
    """
    samples = sampling.frame_samples(rc, seed)
    n = samples["sx"].shape[0]
    tc = cfg.trace_chunks
    if tc > 1 and n % tc == 0:
        # chunk + remat the forward trace: the pure-path aperture solve
        # holds a [chunk, K, T] monomial temp (16 GB at 4K unchunked) and
        # the backward pass recomputes it instead of saving per chunk —
        # what lets the 4K differentiable step (BASELINE config 5) fit HBM
        from .splat import _map_chunks

        def _trace(sx, sy, r1, r2, key):
            sub = {"sx": sx, "sy": sy, "r1": r1, "r2": r2, "key": key}
            return trace_camera_rays(
                cfg, sub, po_lens=po_lens, bokeh_cdf=bokeh_cdf,
                po_state=po_state, use_pallas=use_pallas,
            )

        origin_cs, dir_cs, weight = _map_chunks(
            _trace, tc, samples["sx"], samples["sy"], samples["r1"],
            samples["r2"], samples["key"], remat=True,
        )
    else:
        origin_cs, dir_cs, weight = trace_camera_rays(
            cfg, samples, po_lens=po_lens, bokeh_cdf=bokeh_cdf,
            po_state=po_state, use_pallas=use_pallas,
        )
    if cam_to_world_end is not None:
        m = interp_camera_matrix(cam_to_world, cam_to_world_end,
                                 samples["time"])
        origin_ws, dir_ws = _transform_rays_mb(m, origin_cs, dir_cs)
    else:
        origin_ws, dir_ws = _transform_rays(cam_to_world, origin_cs, dir_cs)
    shaded = scene.shade(origin_ws, dir_ws)
    rgba = shaded["rgba"] * weight[:, None]
    stream = {
        **samples,
        "rgba": rgba,
        "z": shaded["z"],
        "P": shaded["P"],
        "raydir": dir_ws,
        "weight": weight,
        "hit": shaded["hit"],
        "obj_id": shaded["obj_id"],
    }
    # optional AOVs the scene may emit (transmission, volume, ...) ride the
    # sample stream in the same units as rgba (ref src/lentil_filter.cpp:152)
    if "transmission" in shaded:
        stream["transmission"] = shaded["transmission"] * weight[:, None]
    if "volume" in shaded:
        stream["volume"] = shaded["volume"]
    # depth-iterated opacity-weighted id coverage (cryptomatte layers)
    if "crypto_ids" in shaded:
        stream["crypto_ids"] = shaded["crypto_ids"]
        stream["crypto_weights"] = shaded["crypto_weights"]
    return stream


def resolve_gaussian(rc: RenderConfig, stream: dict) -> jnp.ndarray:
    """Cross-pixel gaussian filter over the filter footprint.

    Matches the reference's passthrough filter (filter_gaussian_complete,
    src/lentil.h:736-775): weight = exp(-2 r), r = (2/width)^2 (ox^2+oy^2),
    rejected when r > 1, normalized by the accumulated weight.  With the
    default width 1.5 a sample contributes to every pixel whose center is
    within 0.75 px (Arnold hands the filter all samples in its footprint) —
    a 3x3 neighborhood gather, expressed here as 9 shifted accumulations
    (pure fused elementwise + pad/slice work; no scatter).

    Note on the *redistribution* fallback path: the reference's
    filter_and_add_to_buffer_new uses a box weight of 1.0 into the sample's
    own pixel (the gaussian is commented out, src/lentil.h:938-944), which
    is what render/splat.py does — the footprint gather below applies only
    to this passthrough resolve.
    """
    h, wres, spp = rc.yres_region, rc.xres_region, rc.spp
    ox = stream["ox"].reshape(h, wres, spp)
    oy = stream["oy"].reshape(h, wres, spp)
    rgba = stream["rgba"].reshape(h, wres, spp, 4)
    inv_w2 = (2.0 / rc.filter_width) ** 2
    reach = int(rc.filter_width / 2.0 + 0.5)  # 0 for width<=1, 1 for 1.5

    num = jnp.zeros((h, wres, 4), rgba.dtype)
    den = jnp.zeros((h, wres), rgba.dtype)
    for dy in range(-reach, reach + 1):
        for dx in range(-reach, reach + 1):
            # sample (ox,oy) in pixel p lands at offset (ox-dx, oy-dy) from
            # the center of pixel p+(dx,dy)
            r = inv_w2 * ((ox - dx) ** 2 + (oy - dy) ** 2)
            w = jnp.where(r > 1.0, 0.0, jnp.exp(-2.0 * r))
            n = (rgba * w[..., None]).sum(axis=2)
            d = w.sum(axis=2)
            if dx or dy:
                # shift contribution from source pixel p to pixel p+(dx,dy)
                n = jnp.roll(n, (dy, dx), axis=(0, 1))
                d = jnp.roll(d, (dy, dx), axis=(0, 1))
                # zero the wrapped-around rows/cols (frame edge)
                if dy:
                    row = slice(0, 1) if dy > 0 else slice(h - 1, h)
                    n = n.at[row].set(0.0)
                    d = d.at[row].set(0.0)
                if dx:
                    col = slice(0, 1) if dx > 0 else slice(wres - 1, wres)
                    n = n.at[:, col].set(0.0)
                    d = d.at[:, col].set(0.0)
            num = num + n
            den = den + d
    return num / jnp.maximum(den, 1e-12)[..., None]


@partial(jax.jit, static_argnums=(0, 1), static_argnames=("seed", "po_state"))
def render_frame_simple(cfg: CameraConfig, rc: RenderConfig, scene,
                        cam_to_world, seed: int = 0, po_lens=None,
                        po_state=None, bokeh_cdf=None):
    """Forward-only render (no redistribution): the minimum end-to-end slice."""
    stream = render_sample_stream(cfg, rc, scene, cam_to_world, seed,
                                  po_lens=po_lens, po_state=po_state,
                                  bokeh_cdf=bokeh_cdf)
    return resolve_gaussian(rc, stream)


@partial(jax.jit, static_argnums=(0, 1),
         static_argnames=("seed", "po_state", "use_pallas", "fused_splat",
                          "differentiable"))
def render_frame(cfg: CameraConfig, rc: RenderConfig, scene, cam_to_world,
                 seed: int = 0, po_lens=None, po_state=None, bokeh_cdf=None,
                 cam_to_world_end=None, use_pallas: bool = True,
                 fused_splat: bool = True, differentiable: bool = False):
    """Full pipeline: forward trace + bidirectional redistribution + resolve.

    The TPU equivalent of the reference's complete render flow:
    camera_create_ray -> filter_pixel (redistribution) -> imager resolve.
    Returns (resolved RGBA image [H, W, 4], framebuffer dict).
    """
    from .splat import resolve_imager, splat_frame

    stream = render_sample_stream(
        cfg, rc, scene, cam_to_world, seed, po_lens=po_lens,
        bokeh_cdf=bokeh_cdf, po_state=po_state,
        cam_to_world_end=cam_to_world_end, use_pallas=use_pallas,
    )
    if not rc.enable_redistribution:
        return resolve_gaussian(rc, stream), {}
    fb = splat_frame(
        cfg, rc, scene, stream, cam_to_world, po_lens=po_lens,
        po_state=po_state, bokeh_cdf=bokeh_cdf,
        n_crypto_ids=(scene.n_objects if rc.enable_id_matte else 0),
        cam_to_world_end=cam_to_world_end, use_pallas=use_pallas,
        fused_splat=fused_splat, differentiable=differentiable,
    )
    return resolve_imager(rc, fb), fb


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    """Build a camera->world matrix for a camera looking down -z."""
    import numpy as np

    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = true_up
    m[:3, 2] = -fwd
    m[:3, 3] = eye
    return jnp.asarray(m)
