"""Extended thin-lens camera model with empirical aberrations.

TPU-native re-derivation of zpelgrims/pota ``src/lentil.h:431-569``
(`trace_ray_fw_thinlens`) and ``src/lentil.h:665-692`` (image distances /
circle of confusion).  The reference's data-dependent vignetting-retry
``while`` loop becomes a fixed-K batch of candidate samples with a
first-success select — every ray does identical work, which is what the VPU
wants (SURVEY.md §7.4/§7.8a).

All functions are batched over rays (leading dimension N) and jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CameraConfig
from ..utils import rng as prng
from . import aberrations, samplers


def sample_aperture(cfg: CameraConfig, r1, r2, bokeh_cdf=None):
    """Dispatch to the configured aperture sampler. Returns unit-disk points.

    Mirrors the sampler selection at ref src/lentil.h:460-473.
    ``bokeh_cdf`` is an optional image-bokeh sampler table
    (see :mod:`pota_tpu.render.bokeh_image`).
    """
    if cfg.bokeh_enable_image and bokeh_cdf is not None:
        from ..render.bokeh_image import bokeh_sample_alias
        return bokeh_sample_alias(bokeh_cdf, r1, r2)
    if cfg.aperture_blades < 2:
        return samplers.concentric_disk_sample_aberrated(
            r1, r2, cfg.effective_abb_spherical, cfg.effective_circle_to_square
        )
    return samplers.triangular_aperture_sample(r1, r2, 1.0, cfg.aperture_blades)


def trace_fw_thinlens(
    cfg: CameraConfig,
    sx,
    sy,
    r1,
    r2,
    retry_key=None,
    deriv_ray: bool = False,
    bokeh_cdf=None,
):
    """Forward thin-lens trace, batched over rays.

    Args:
      sx, sy: screen coords in [-1, 1] (y pre-scaled by aspect), shape [N].
      r1, r2: primary lens uniforms (the "blue-noise" pair), shape [N].
      retry_key: uint32 per-ray key for retry randomness; required unless
        ``deriv_ray`` (derivative rays reuse r1/r2 and never retry,
        ref src/lentil_camera.cpp:96-119 + `deriv_ray` flag).

    Returns:
      (origin [N,3], direction [N,3], weight [N], tries [N]) in camera space
      (camera looks down -z), scaled to scene units.
    """
    n_tries = 1 if deriv_ray else cfg.vignetting_retries + 1

    # -- sensor point (identical across retries) --------------------------
    s = jnp.stack([sx, sy], -1)
    if cfg.abb_distortion > 0.0:
        s = aberrations.barrel_distortion(s, cfg.abb_distortion)
    p = jnp.stack(
        [
            s[..., 0] * (cfg.sensor_width * 0.5),
            s[..., 1] * (cfg.sensor_width * 0.5),
            jnp.full_like(sx, -cfg.effective_focal_length),
        ],
        -1,
    )
    dir_from_center = p / jnp.linalg.norm(p, axis=-1, keepdims=True)

    # -- K candidate aperture samples: try 0 = caller's r1/r2, retries from
    #    the counter RNG (replaces the reference's stateful xor128) ---------
    if cfg.enable_dof:
        if n_tries > 1:
            tries_idx = jnp.arange(1, n_tries, dtype=jnp.uint32)
            us = prng.uniforms(
                retry_key[:, None], tries_idx[None, :], 2
            )  # [N, K-1, 2]
            r1k = jnp.concatenate([r1[:, None], us[..., 0]], axis=1)  # [N, K]
            r2k = jnp.concatenate([r2[:, None], us[..., 1]], axis=1)
        else:
            r1k, r2k = r1[:, None], r2[:, None]
        unit_disk = sample_aperture(cfg, r1k, r2k, bokeh_cdf)  # [N, K, 2]
    else:
        unit_disk = jnp.zeros(sx.shape + (n_tries, 2))

    unit_disk = unit_disk.at[..., 0].multiply(cfg.effective_anamorphic)

    lens = jnp.concatenate(
        [
            unit_disk * cfg.thinlens_aperture_radius,
            jnp.zeros_like(unit_disk[..., :1]),
        ],
        -1,
    )  # [N, K, 3]

    dfc = dir_from_center[:, None, :]  # broadcast over K
    intersection = jnp.abs(cfg.focus_distance / dfc[..., 2])
    focus_point = dfc * intersection[..., None]
    dir_from_lens = focus_point - lens
    dir_from_lens = dir_from_lens / jnp.linalg.norm(
        dir_from_lens, axis=-1, keepdims=True
    )

    if cfg.abb_coma != 0.0:
        coma_mult = cfg.abb_coma * aberrations.coma_multiplier(
            cfg.sensor_width, cfg.effective_focal_length, dfc, unit_disk
        )
        dir_from_lens = aberrations.coma_perturb(
            dir_from_lens, dir_from_lens, coma_mult, reverse=False
        )

    # -- vignetting gate (skipped for derivative rays, ref src/lentil.h:494)
    if cfg.optical_vignetting_distance > 0.0 and not deriv_ray:
        ok = aberrations.optical_vignetting_square(
            lens,
            dir_from_lens,
            cfg.thinlens_aperture_radius,
            cfg.optical_vignetting_radius,
            cfg.optical_vignetting_distance,
            samplers.lerp_squircle_mapping(cfg.effective_circle_to_square),
        )  # [N, K]
    else:
        ok = jnp.ones(lens.shape[:-1], dtype=bool)

    # -- first-success select ---------------------------------------------
    first = jnp.argmax(ok, axis=-1)  # index of first True (0 if none)
    any_ok = jnp.any(ok, axis=-1)
    take = lambda a: jnp.take_along_axis(
        a, first[:, None, None], axis=1
    ).squeeze(1)
    origin = take(lens)
    direction = take(dir_from_lens)

    scale = cfg.unit_scale_thinlens
    origin = origin * scale
    direction = direction * scale
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)

    weight = jnp.where(any_ok, 1.0, 0.0)
    tries = jnp.where(any_ok, first, n_tries).astype(jnp.int32)
    return origin, direction, weight, tries


def image_dist(focal_length, z):
    """Thin-lens image distance for an object at (negative) depth z."""
    return (-focal_length * z) / (-focal_length + z)


def image_dist_focusdist(cfg: CameraConfig, shift=0.0):
    """Image distance of the focus plane (ref src/lentil.h:665-671)."""
    fd = cfg.focus_distance + shift
    return (-cfg.effective_focal_length * -fd) / (-cfg.effective_focal_length + -fd)


def coc_thinlens(cfg: CameraConfig, camera_space_z, aperture_radius=None,
                 focus_distance=None):
    """Circle-of-confusion *diameter* in screen units (ref src/lentil.h:674-692).

    ``camera_space_z`` is the (negative) camera-space depth of the sample in
    the filter's unit scale.  The focus distance / aperture radius rescale
    reconciles the PO and thin-lens setups exactly as the reference does:
    thin-lens multiplies the aperture radius by 10, PO divides its
    (setup-time x10) focus distance by 10.  For the PO camera, pass its
    calibrated ``aperture_radius`` (mm) and x10 ``focus_distance``.
    """
    from ..config import CameraType

    if cfg.camera_type == CameraType.POLYNOMIAL_OPTICS:
        assert aperture_radius is not None and focus_distance is not None
        focus_distance = focus_distance / 10.0
    else:
        aperture_radius = cfg.thinlens_aperture_radius * 10.0
        focus_distance = cfg.focus_distance

    f = cfg.effective_focal_length
    image_dist_samplepos = (-f * camera_space_z) / (-f + camera_space_z)
    image_dist_fd = (-f * -focus_distance) / (-f + -focus_distance)
    return jnp.abs(
        (aperture_radius * (image_dist_samplepos - image_dist_fd))
        / image_dist_samplepos
    )
