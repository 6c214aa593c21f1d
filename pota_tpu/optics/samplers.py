"""Aperture samplers: concentric disk, n-blade triangular fan, squircle lerp.

Vectorized JAX equivalents of the reference's samplers
(zpelgrims/pota ``src/lens.h:309-333, 477-514``; blades:
``src/lentil.h:964-982``).  All take uniforms in [0,1) and return points on
the unit aperture; scaling by the aperture radius happens at the call site,
as in the reference.
"""
from __future__ import annotations

import jax.numpy as jnp


def bias(value, b):
    """Schlick bias curve, equivalent to Arnold's AiBias: value**(log(b)/log(0.5)).

    Used to push disk samples toward the rim (spherical aberration control,
    ref src/lens.h:500).
    """
    return jnp.power(value, jnp.log(b) / jnp.log(0.5))


def concentric_disk_sample(r1, r2):
    """Uniform concentric (Shirley) mapping of the unit square onto the disk.

    Ref src/lens.h:309-333 (exact trigonometry; the reference's fast_sin /
    fast_cos approximation is a scalar-CPU micro-optimization with no value on
    the TPU VPU, so we use the exact functions).
    """
    a = 2.0 * r1 - 1.0
    b2 = 2.0 * r2 - 1.0
    use_a = (a * a) > (b2 * b2)
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_b = jnp.where(b2 == 0.0, 1.0, b2)
    r = jnp.where(use_a, a, b2)
    phi = jnp.where(
        use_a,
        (jnp.pi / 4.0) * (b2 / safe_a),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (a / safe_b),
    )
    both_zero = (a == 0.0) & (b2 == 0.0)
    x = jnp.where(both_zero, 0.0, r * jnp.cos(phi))
    y = jnp.where(both_zero, 0.0, r * jnp.sin(phi))
    return jnp.stack([x, y], -1)


def concentric_disk_sample_aberrated(r1, r2, abb_spherical, circle_to_square):
    """Concentric disk sample with spherical-aberration bias and squircle lerp.

    Ref src/lens.h:477-514: radius is biased (``AiBias``) when
    ``abb_spherical != 0.5``, then the point is lerped toward the square
    corner sample by ``circle_to_square``.
    """
    a = 2.0 * r1 - 1.0
    b2 = 2.0 * r2 - 1.0
    use_a = (a * a) > (b2 * b2)
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_b = jnp.where(b2 == 0.0, 1.0, b2)
    r = jnp.where(use_a, a, b2)
    phi = jnp.where(
        use_a,
        (jnp.pi / 4.0) * (b2 / safe_a),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (a / safe_b),
    )
    r = jnp.where(
        abb_spherical != 0.5, bias(jnp.abs(r), abb_spherical) * jnp.sign(r), r
    )
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    # lerp toward the raw square sample (squircle control)
    x = jnp.where(circle_to_square > 0.0, x + circle_to_square * (a - x), x)
    y = jnp.where(circle_to_square > 0.0, y + circle_to_square * (b2 - y), y)
    both_zero = (a == 0.0) & (b2 == 0.0)
    x = jnp.where(both_zero, 0.0, x)
    y = jnp.where(both_zero, 0.0, y)
    return jnp.stack([x, y], -1)


def triangular_aperture_sample(r1, r2, radius, blades: int):
    """Sample an n-bladed polygonal aperture as a fan of triangles.

    Ref src/lentil.h:964-982: pick a triangle from r1, re-scale r1, then
    sample the triangle with the sqrt warp.
    """
    tri = jnp.floor(r1 * blades)
    r1s = r1 * blades - tri
    a = jnp.sqrt(r1s)
    b = (1.0 - r2) * a
    c = r2 * a
    ang1 = 2.0 * jnp.pi / blades * (tri + 1.0)
    ang2 = 2.0 * jnp.pi / blades * tri
    p1_sin, p1_cos = jnp.sin(ang1), jnp.cos(ang1)
    p2_sin, p2_cos = jnp.sin(ang2), jnp.cos(ang2)
    x = radius * (b * p1_cos + c * p2_cos)
    y = radius * (b * p1_sin + c * p2_sin)
    return jnp.stack([x, y], -1)


def lerp_squircle_mapping(amount):
    """Empirical squircle exponent used by the optical-vignetting gate.

    Ref src/lens.h:541-543.
    """
    return 1.0 + jnp.log(1.0 + amount) * jnp.exp(amount * 3.0)
