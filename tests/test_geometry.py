"""Round-trip and invariant tests for the pupil chart transforms."""
import numpy as np
import jax.numpy as jnp

from pota_tpu.optics import geometry as geo


def test_plane_roundtrip(rng_np):
    pos2 = jnp.asarray(rng_np.uniform(-5, 5, (64, 2)), jnp.float32)
    dir2 = jnp.asarray(rng_np.uniform(-0.3, 0.3, (64, 2)), jnp.float32)
    p3, d3 = geo.plane_to_cs(pos2, dir2, 10.0)
    # propagate a bit then map back to the same plane
    p3b = p3 + d3 * 0.0
    pos2b, dir2b = geo.cs_to_plane(p3b, d3, 10.0)
    np.testing.assert_allclose(np.asarray(pos2b), np.asarray(pos2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dir2b), np.asarray(dir2), atol=1e-5)


def test_sphere_roundtrip(rng_np):
    R = 35.0
    pos2 = jnp.asarray(rng_np.uniform(-10, 10, (128, 2)), jnp.float32)
    dir2 = jnp.asarray(rng_np.uniform(-0.4, 0.4, (128, 2)), jnp.float32)
    p3, d3 = geo.sphere_to_cs(pos2, dir2, -R, R)
    pos2b, dir2b = geo.cs_to_sphere(p3, d3, -R, R)
    np.testing.assert_allclose(np.asarray(pos2b), np.asarray(pos2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dir2b), np.asarray(dir2), atol=1e-4)


def test_sphere_position_is_on_sphere(rng_np):
    R = 20.0
    pos2 = jnp.asarray(rng_np.uniform(-8, 8, (64, 2)), jnp.float32)
    dir2 = jnp.zeros((64, 2), jnp.float32)
    p3, d3 = geo.sphere_to_cs(pos2, dir2, -R, R)
    # |p - center| == R, center at (0,0,-R)
    d = np.linalg.norm(np.asarray(p3) - np.array([0.0, 0.0, -R]), axis=-1)
    np.testing.assert_allclose(d, R, rtol=1e-5)
    # direction is unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d3), axis=-1), 1.0, atol=1e-5
    )


def test_cylinder_roundtrip(rng_np):
    R = 30.0
    for cyl_y in (True, False):
        pos2 = jnp.asarray(rng_np.uniform(-9, 9, (64, 2)), jnp.float32)
        dir2 = jnp.asarray(rng_np.uniform(-0.3, 0.3, (64, 2)), jnp.float32)
        p3, d3 = geo.cylinder_to_cs(pos2, dir2, -R, R, cyl_y)
        pos2b, dir2b = geo.cs_to_cylinder(p3, d3, -R, R, cyl_y)
        np.testing.assert_allclose(np.asarray(pos2b), np.asarray(pos2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dir2b), np.asarray(dir2), atol=1e-4)


def test_line_plane_intersection_y0():
    origin = jnp.array([[0.0, 10.0, 0.0]])
    direction = jnp.array([[0.0, -1.0, 1.0]])
    hit = np.asarray(geo.line_plane_intersection_y0(origin, direction))[0]
    np.testing.assert_allclose(hit[1], 0.0, atol=1e-5)
    np.testing.assert_allclose(hit[2], 10.0, atol=1e-5)
