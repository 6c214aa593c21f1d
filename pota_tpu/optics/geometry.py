"""Chart transforms between 2D light-field coordinates and 3D camera space.

These are vectorized JAX re-derivations of the coordinate charts used by the
reference's polynomial-optics core (``src/lens.h:75-221`` in zpelgrims/pota):
rays crossing the outer/inner pupil are stored as a 4-vector ``[x, y, dx, dy]``
on a sphere (or cylinder) chart — position on the pupil surface plus direction
encoded as the projection onto the tangent plane of the local normal.

All functions are batched: inputs of shape ``(..., 2)`` / ``(..., 3)``.
Everything works in lens-space millimeters.
"""
from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x, eps=1e-20):
    """sqrt with NaN-free gradients: sqrt(max(0,x)) has d/dx = 0 * inf = NaN
    on the clamped branch; the double-where keeps both value and gradient
    clean at and below zero."""
    return jnp.where(x > eps, jnp.sqrt(jnp.maximum(x, eps)), 0.0)


def _normalize(v, axis=-1, eps=1e-12):
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, eps * eps))


def plane_to_cs(pos2, dir2, plane_z):
    """Two-plane chart -> 3D ray. dir2 is slope (dz==1 before normalize)."""
    outpos = jnp.stack([pos2[..., 0], pos2[..., 1], jnp.broadcast_to(plane_z, pos2[..., 0].shape)], -1)
    outdir = jnp.stack([dir2[..., 0], dir2[..., 1], jnp.ones_like(dir2[..., 0])], -1)
    return outpos, _normalize(outdir)


def cs_to_plane(pos3, dir3, plane_z):
    """3D ray -> two-plane chart at ``z = plane_z`` (ref src/lens.h:87-97)."""
    t = (plane_z - pos3[..., 2]) / dir3[..., 2]
    out_x = pos3[..., 0] + t * dir3[..., 0]
    out_y = pos3[..., 1] + t * dir3[..., 1]
    abs_dz = jnp.abs(dir3[..., 2])
    return (
        jnp.stack([out_x, out_y], -1),
        jnp.stack([dir3[..., 0] / abs_dz, dir3[..., 1] / abs_dz], -1),
    )


def _sphere_tangent_frame(normal):
    """Tangent/bitangent for a pupil-sphere normal (ref src/lens.h:113-116)."""
    ex = jnp.stack([normal[..., 2], jnp.zeros_like(normal[..., 2]), -normal[..., 0]], -1)
    ex = _normalize(ex)
    ey = jnp.cross(normal, ex)
    return ex, ey


def sphere_to_cs(pos2, dir2, center, sphere_rad):
    """Sphere chart -> 3D ray (ref src/lens.h:99-125).

    ``pos2`` is a point on the sphere of radius ``sphere_rad`` centered at
    ``(0,0,center)``; ``dir2`` is the direction's projection on the tangent
    disk of the local normal.
    """
    r2 = pos2[..., 0] ** 2 + pos2[..., 1] ** 2
    nz = safe_sqrt(sphere_rad**2 - r2) / jnp.abs(sphere_rad)
    normal = jnp.stack([pos2[..., 0] / sphere_rad, pos2[..., 1] / sphere_rad, nz], -1)

    d2 = dir2[..., 0] ** 2 + dir2[..., 1] ** 2
    tz = safe_sqrt(1.0 - d2)
    temp = jnp.stack([dir2[..., 0], dir2[..., 1], tz], -1)

    ex, ey = _sphere_tangent_frame(normal)
    outdir = (
        temp[..., 0:1] * ex + temp[..., 1:2] * ey + temp[..., 2:3] * normal
    )
    outpos = jnp.stack(
        [pos2[..., 0], pos2[..., 1], normal[..., 2] * sphere_rad + center], -1
    )
    return outpos, outdir


def cs_to_sphere(pos3, dir3, center, sphere_rad):
    """3D ray -> sphere chart (ref src/lens.h:127-153). Assumes pos3 on sphere."""
    normal = jnp.stack(
        [
            pos3[..., 0] / sphere_rad,
            pos3[..., 1] / sphere_rad,
            jnp.abs((pos3[..., 2] - center) / sphere_rad),
        ],
        -1,
    )
    temp = _normalize(dir3)
    ex, ey = _sphere_tangent_frame(normal)
    out_dx = jnp.sum(temp * ex, -1)
    out_dy = jnp.sum(temp * ey, -1)
    return (
        jnp.stack([pos3[..., 0], pos3[..., 1]], -1),
        jnp.stack([out_dx, out_dy], -1),
    )


def cylinder_to_cs(pos2, dir2, center, radius, cyl_y):
    """Cylinder chart -> 3D ray (ref src/lens.h:188-221); cyl_y: axis along y."""
    zeros = jnp.zeros_like(pos2[..., 0])
    if cyl_y:
        nz = safe_sqrt(radius**2 - pos2[..., 0] ** 2) / jnp.abs(radius)
        normal = jnp.stack([pos2[..., 0] / radius, zeros, nz], -1)
    else:
        nz = safe_sqrt(radius**2 - pos2[..., 1] ** 2) / jnp.abs(radius)
        normal = jnp.stack([zeros, pos2[..., 1] / radius, nz], -1)

    d2 = dir2[..., 0] ** 2 + dir2[..., 1] ** 2
    tz = safe_sqrt(1.0 - d2)
    temp = jnp.stack([dir2[..., 0], dir2[..., 1], tz], -1)

    ex = jnp.stack([normal[..., 2], zeros, -normal[..., 0]], -1)
    ex = _normalize(ex)
    ey = _normalize(jnp.cross(normal, ex))
    outdir = temp[..., 0:1] * ex + temp[..., 1:2] * ey + temp[..., 2:3] * normal
    outpos = jnp.stack(
        [pos2[..., 0], pos2[..., 1], normal[..., 2] * radius + center], -1
    )
    return outpos, outdir


def cs_to_cylinder(pos3, dir3, center, radius, cyl_y):
    """3D ray -> cylinder chart (ref src/lens.h:156-185)."""
    zeros = jnp.zeros_like(pos3[..., 0])
    nz = jnp.abs((pos3[..., 2] - center) / radius)
    if cyl_y:
        normal = jnp.stack([pos3[..., 0] / radius, zeros, nz], -1)
    else:
        normal = jnp.stack([zeros, pos3[..., 1] / radius, nz], -1)
    temp = _normalize(dir3)
    # NB: the reference leaves ex unnormalized here (src/lens.h:171), which
    # makes its cyl-x chart non-orthonormal; we normalize so the chart
    # round-trips exactly (both directions are ours, so parity is preserved).
    ex = _normalize(jnp.stack([normal[..., 2], zeros, -normal[..., 0]], -1))
    ey = _normalize(jnp.cross(normal, ex))
    out_dx = jnp.sum(temp * ex, -1)
    out_dy = jnp.sum(temp * ey, -1)
    return (
        jnp.stack([pos3[..., 0], pos3[..., 1]], -1),
        jnp.stack([out_dx, out_dy], -1),
    )


def chart_to_cs(pos2, dir2, center, radius, chart: str = "sphere"):
    """Pupil chart -> 3D ray, dispatched by the lens's pupil geometry.

    The reference dispatches per lens on the generated
    ``lens_inner/outer_pupil_geometry`` string ("sphere" / "cyl-x" /
    "cyl-y", src/lentil.h:387-389, 1418-1424); anamorphic prescriptions use
    the cylinder charts.
    """
    if chart == "sphere":
        return sphere_to_cs(pos2, dir2, center, radius)
    if chart == "cyl-x":
        return cylinder_to_cs(pos2, dir2, center, radius, cyl_y=False)
    if chart == "cyl-y":
        return cylinder_to_cs(pos2, dir2, center, radius, cyl_y=True)
    raise ValueError(f"unknown pupil chart {chart!r}")


def cs_to_chart(pos3, dir3, center, radius, chart: str = "sphere"):
    """3D ray -> pupil chart (inverse of :func:`chart_to_cs`)."""
    if chart == "sphere":
        return cs_to_sphere(pos3, dir3, center, radius)
    if chart == "cyl-x":
        return cs_to_cylinder(pos3, dir3, center, radius, cyl_y=False)
    if chart == "cyl-y":
        return cs_to_cylinder(pos3, dir3, center, radius, cyl_y=True)
    raise ValueError(f"unknown pupil chart {chart!r}")


def line_plane_intersection_y0(origin, direction):
    """Intersection of a ray with the plane y=0 (ref src/lens.h:412-419).

    Used by the focus solvers to find where an off-axis ray crosses the
    optical axis plane.
    """
    d = _normalize(direction)
    plane_n = jnp.array([0.0, 1.0, 0.0])
    coord = _normalize(jnp.array([100.0, 0.0, 100.0]))
    num = jnp.sum(coord * plane_n) - jnp.sum(plane_n * origin, -1)
    den = jnp.sum(plane_n * d, -1)
    t = num / den
    return origin + d * t[..., None]
