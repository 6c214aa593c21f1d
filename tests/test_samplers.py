"""Tests for aperture samplers and aberration helpers."""
import numpy as np
import jax.numpy as jnp

from pota_tpu.optics import aberrations, samplers


def _grid_uniforms(n):
    u = (np.arange(n) + 0.5) / n
    r1, r2 = np.meshgrid(u, u)
    return jnp.asarray(r1.ravel(), jnp.float32), jnp.asarray(r2.ravel(), jnp.float32)


def test_concentric_disk_in_unit_disk():
    r1, r2 = _grid_uniforms(32)
    d = np.asarray(samplers.concentric_disk_sample(r1, r2))
    assert np.all(np.linalg.norm(d, axis=-1) <= 1.0 + 1e-6)
    # uniform on the disk: mean radius of uniform disk = 2/3
    assert abs(np.linalg.norm(d, axis=-1).mean() - 2.0 / 3.0) < 0.01
    # centered
    assert np.abs(d.mean(0)).max() < 0.01


def test_concentric_disk_aberrated_neutral_matches_plain():
    r1, r2 = _grid_uniforms(16)
    plain = np.asarray(samplers.concentric_disk_sample(r1, r2))
    ab = np.asarray(
        samplers.concentric_disk_sample_aberrated(r1, r2, 0.5, 0.0)
    )
    np.testing.assert_allclose(ab, plain, atol=1e-5)


def test_concentric_disk_spherical_bias_pushes_to_rim():
    r1, r2 = _grid_uniforms(32)
    rim = np.asarray(samplers.concentric_disk_sample_aberrated(r1, r2, 0.9, 0.0))
    ctr = np.asarray(samplers.concentric_disk_sample_aberrated(r1, r2, 0.1, 0.0))
    assert np.linalg.norm(rim, axis=-1).mean() > np.linalg.norm(ctr, axis=-1).mean()


def test_triangular_aperture_within_radius():
    r1, r2 = _grid_uniforms(32)
    for blades in (3, 5, 8):
        d = np.asarray(samplers.triangular_aperture_sample(r1, r2, 1.0, blades))
        assert np.all(np.linalg.norm(d, axis=-1) <= 1.0 + 1e-5)


def test_barrel_distortion_inverse():
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(-0.7, 0.7, (256, 2)), jnp.float32)
    b = 0.3
    dist = aberrations.barrel_distortion(uv, b)
    undist = aberrations.inverse_barrel_distortion(dist, b)
    np.testing.assert_allclose(np.asarray(undist), np.asarray(uv), atol=2e-3)


def test_coma_perturb_preserves_length_and_reverses():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(64, 3))
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    out = aberrations.coma_perturb(d, d, 0.7, reverse=False)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5
    )
    back = aberrations.coma_perturb(d, out, 0.7, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(d), atol=1e-5)


def test_optical_vignetting_center_passes_edge_fails():
    origin = jnp.zeros((2, 3))
    direction = jnp.asarray(
        [[0.0, 0.0, -1.0], [0.95, 0.0, -0.31]], jnp.float32
    )
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    ok = np.asarray(
        aberrations.optical_vignetting_square(
            origin, direction, 1.0, 1.0, 1.0, 1.0
        )
    )
    assert ok[0] and not ok[1]
