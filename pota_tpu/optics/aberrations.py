"""Empirical aberration helpers for the extended thin-lens model.

Vectorized JAX equivalents of zpelgrims/pota ``src/lens.h:519-582``
(optical vignetting, barrel distortion + closed-form cubic inverse, coma
perturbation) — re-derived array-first for TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(v, axis=-1, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def optical_vignetting_square(origin, direction, aperture_radius,
                              ov_radius, ov_distance, square_bias):
    """Cat-eye / optical vignetting gate via a virtual second aperture.

    Returns a boolean mask: True where the ray survives.
    Ref src/lens.h:529-538 (`empericalOpticalVignettingSquare`): intersect the
    ray with a virtual aperture plane at ``ov_distance`` and test the point
    against a superellipse of radius ``aperture_radius * ov_radius``.
    """
    t = jnp.abs(ov_distance / direction[..., 2])
    p = direction * t[..., None] - origin
    power = 1.0 + square_bias
    radius = aperture_radius * ov_radius
    dist = jnp.abs(p[..., 0]) ** power + jnp.abs(p[..., 1]) ** power
    return dist <= radius**power


def barrel_distortion(uv, distortion):
    """Quadratic barrel distortion of screen coords (ref src/lens.h:545-548)."""
    return uv * (1.0 + jnp.sum(uv * uv, -1, keepdims=True) * distortion)


def inverse_barrel_distortion(uv, distortion):
    """Closed-form cubic inverse of :func:`barrel_distortion`.

    Ref src/lens.h:550-559: solves ``x (1 + b x^2) = l`` for x via Cardano.
    """
    b = distortion
    l = jnp.linalg.norm(uv, axis=-1, keepdims=True)
    l_safe = jnp.maximum(l, 1e-12)
    x0 = (
        9.0 * b * b * l_safe
        + jnp.sqrt(3.0) * jnp.sqrt(27.0 * b**4 * l_safe**2 + 4.0 * b**3)
    ) ** (1.0 / 3.0)
    x = x0 / (2.0 ** (1.0 / 3.0) * 3.0 ** (2.0 / 3.0) * b) - (2.0 / 3.0) ** (
        1.0 / 3.0
    ) / x0
    return uv * (x / l_safe)


def coma_multiplier(sensor_width, focal_length, dir_from_center, unit_disk):
    """Field x aperture distance factor scaling the coma rotation.

    Ref src/lens.h:563-571: measures how far the central (unperturbed) ray is
    from the sensor center relative to the most oblique possible ray, times
    the sample's distance from the aperture center.
    """
    maximal = jnp.array(
        [sensor_width * 0.5, sensor_width * 0.5, -focal_length]
    )
    maximal = maximal / jnp.linalg.norm(maximal)
    axis_z = jnp.array([0.0, 0.0, -1.0])
    maximal_proj = jnp.sum(maximal * axis_z)
    current_proj = jnp.sum(dir_from_center * axis_z, -1)
    projection_perc = (
        (current_proj - maximal_proj) / (1.0 - maximal_proj) - 0.5
    ) * 2.0
    dist_from_sensor_center = 1.0 - projection_perc
    dist_from_aperture = jnp.linalg.norm(unit_disk, axis=-1)
    return dist_from_sensor_center * dist_from_aperture


def _rotation_matrix(axis, angle):
    """Rodrigues axis-angle rotation matrix, batched over leading dims."""
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    one_c = 1.0 - c
    row0 = jnp.stack(
        [c + x * x * one_c, x * y * one_c - z * s, x * z * one_c + y * s], -1
    )
    row1 = jnp.stack(
        [y * x * one_c + z * s, c + y * y * one_c, y * z * one_c - x * s], -1
    )
    row2 = jnp.stack(
        [z * x * one_c - y * s, z * y * one_c + x * s, c + z * z * one_c], -1
    )
    return jnp.stack([row0, row1, row2], -2)


def coma_perturb(dir_from_lens, ray_to_perturb, abb_coma, reverse: bool):
    """Rotate a ray around the axis orthogonal to its direction and -z.

    Ref src/lens.h:575-582 (`abb_coma_perturb`): angle is
    ``abb_coma * 2.3456 * pi / 180`` (the constant is the reference author's
    empirical tuning), reversed for the backward path.
    """
    axis = _normalize(
        jnp.cross(dir_from_lens, jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), dir_from_lens.shape))
    )
    angle = abb_coma * 2.3456 * jnp.pi / 180.0
    angle = jnp.where(reverse, -angle, angle)
    rot = _rotation_matrix(axis, jnp.broadcast_to(angle, axis[..., 0].shape))
    return jnp.einsum("...ij,...j->...i", rot, ray_to_perturb,
                      precision=jax.lax.Precision.HIGHEST)
