"""Pallas kernels vs the pure-JAX polynomial path (interpret mode on CPU).

The fused per-lens kernels (pota_tpu/ops/po_pallas.py) bake a lens's sparse
polynomial tables in as immediates; these tests check the generated program
against the differentiable pure-JAX oracle on a small synthetic lens (few
terms so interpret-mode tracing stays fast — real-lens parity is covered by
the on-TPU render path).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu.optics.polynomial import (
    PolyFunction,
    PolyLens,
    lt_sample_aperture,
    pt_evaluate,
    pt_sample_aperture,
)
from pota_tpu.ops.po_pallas import (
    build_po_backward_kernel,
    build_po_forward_kernel,
)


@pytest.fixture(scope="module")
def synthetic_lens():
    """Paraxial-ish lens with a shared sparse term set + mild nonlinearity."""
    exps = np.array(
        [
            (0, 0, 0, 0, 0),
            (1, 0, 0, 0, 0),
            (0, 1, 0, 0, 0),
            (0, 0, 1, 0, 0),
            (0, 0, 0, 1, 0),
            (0, 0, 0, 0, 1),
            (2, 0, 0, 0, 0),
            (0, 0, 2, 0, 0),
            (1, 0, 1, 0, 0),
            (0, 1, 0, 1, 0),
            (1, 0, 0, 0, 1),
            (0, 0, 1, 0, 2),
        ],
        np.int32,
    )
    scale = np.array([1 / 25.0, 1 / 25.0, 1 / 0.6, 1 / 0.6, 5.0], np.float32)
    shift = np.array([0.0, 0.0, 0.0, 0.0, 0.55], np.float32)
    T = len(exps)

    ap_z, bfl, ll = 40.0, 45.0, 50.0
    # conditioned linear gains: x term carries 25mm, dx term 0.6 slope
    ap = np.zeros((2, T))
    ap[0, 1] = 25.0
    ap[0, 3] = 0.6 * ap_z
    ap[0, 8] = 0.8          # mild x*dx cross term
    ap[1, 2] = 25.0
    ap[1, 4] = 0.6 * ap_z
    ap[1, 9] = 0.8

    pt = np.zeros((5, T))
    z_pupil = bfl + ll
    pt[0, 1] = 25.0
    pt[0, 3] = 0.6 * z_pupil
    pt[0, 10] = 0.3          # chromatic-ish x*lambda
    pt[1, 2] = 25.0
    pt[1, 4] = 0.6 * z_pupil
    # exit direction chart: mostly the sensor slope with a focal kick from x
    pt[2, 3] = 0.45
    pt[2, 1] = -25.0 / 140.0
    pt[2, 11] = 0.02
    pt[3, 4] = 0.45
    pt[3, 2] = -25.0 / 140.0
    # transmittance: 1 at the center, rolling off quadratically
    pt[4, 0] = 1.0
    pt[4, 6] = -0.3
    pt[4, 7] = -0.25

    mk = lambda c: PolyFunction(
        exponents=jnp.asarray(exps),
        coeffs=jnp.asarray(c, jnp.float32),
        in_scale=jnp.asarray(scale),
        in_shift=jnp.asarray(shift),
        max_degree=2,
    )
    return PolyLens(
        pt=mk(pt), ap=mk(ap),
        lens_length=ll, back_focal_length=bfl, efl=50.0,
        aperture_z=ap_z, aperture_housing_radius=12.0,
        inner_pupil_radius=15.0, outer_pupil_radius=20.0,
        inner_pupil_curvature_radius=-50.0,
        outer_pupil_curvature_radius=60.0,
        fov=0.7, fstop=2.0, aperture_radius_at_fstop=12.0,
        name="synthetic_test_lens",
    )


def test_forward_kernel_matches_pure(synthetic_lens):
    lens = synthetic_lens
    rng = np.random.default_rng(7)
    n = 300
    x = rng.uniform(-15, 15, n).astype(np.float32)
    y = rng.uniform(-15, 15, n).astype(np.float32)
    ax = rng.uniform(-8, 8, n).astype(np.float32)
    ay = rng.uniform(-8, 8, n).astype(np.float32)
    lam = rng.uniform(0.4, 0.7, n).astype(np.float32)
    sensor_shift = 1.5

    sensor5 = jnp.stack([x, y, np.zeros_like(x), np.zeros_like(x), lam], -1)
    ap_t = jnp.stack([ax, ay], -1)
    solved = pt_sample_aperture(lens, sensor5, ap_t, iterations=3)
    shifted = solved.at[..., 0].add(solved[..., 2] * sensor_shift)
    shifted = shifted.at[..., 1].add(shifted[..., 3] * sensor_shift)
    out4_ref, trans_ref = pt_evaluate(lens, shifted)

    kern = build_po_forward_kernel(
        lens, sensor_shift, newton_iterations=3, interpret=True
    )
    out4, trans, dx, dy = kern(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(ax), jnp.asarray(ay),
        jnp.asarray(lam),
    )
    np.testing.assert_allclose(
        np.asarray(out4), np.asarray(out4_ref), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(trans), np.asarray(trans_ref), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(solved[..., 2]), rtol=1e-4, atol=1e-5
    )


@pytest.fixture(scope="module")
def catalog_lens():
    """A real committed 160-term catalog fit — catches coefficient-baking
    bugs the synthetic 12-term lens cannot (term ordering, conditioning
    constants, degree unrolling)."""
    from pota_tpu.optics.fit import load_poly_lens

    poly = load_poly_lens("angenieux__double_gauss__1953__49mm", degree=5)
    if poly is None:
        pytest.skip("flagship fit missing")
    return poly


@pytest.mark.slow
def test_forward_kernel_matches_pure_catalog_lens(catalog_lens):
    lens = catalog_lens
    rng = np.random.default_rng(3)
    n = 64
    x = rng.uniform(-12, 12, n).astype(np.float32)
    y = rng.uniform(-12, 12, n).astype(np.float32)
    r_ap = lens.aperture_housing_radius * 0.6
    ax = rng.uniform(-r_ap, r_ap, n).astype(np.float32)
    ay = rng.uniform(-r_ap, r_ap, n).astype(np.float32)
    lam = rng.uniform(0.42, 0.68, n).astype(np.float32)
    sensor_shift = 2.0

    sensor5 = jnp.stack([x, y, np.zeros_like(x), np.zeros_like(x), lam], -1)
    solved = pt_sample_aperture(
        lens, sensor5, jnp.stack([ax, ay], -1), iterations=3
    )
    shifted = solved.at[..., 0].add(solved[..., 2] * sensor_shift)
    shifted = shifted.at[..., 1].add(shifted[..., 3] * sensor_shift)
    out4_ref, trans_ref = pt_evaluate(lens, shifted)

    kern = build_po_forward_kernel(
        lens, sensor_shift, newton_iterations=3, interpret=True
    )
    out4, trans, dx, dy = kern(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(ax), jnp.asarray(ay),
        jnp.asarray(lam),
    )
    np.testing.assert_allclose(
        np.asarray(out4), np.asarray(out4_ref), rtol=2e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(trans), np.asarray(trans_ref), rtol=2e-4, atol=5e-4
    )


@pytest.mark.slow
def test_backward_kernel_matches_pure_catalog_lens(catalog_lens):
    lens = catalog_lens
    rng = np.random.default_rng(5)
    n = 64
    scene = np.stack(
        [
            rng.uniform(-80, 80, n),
            rng.uniform(-80, 80, n),
            rng.uniform(500, 3000, n),
        ],
        -1,
    ).astype(np.float32)
    r_ap = lens.aperture_housing_radius * 0.5
    ap = (rng.uniform(-1, 1, (n, 2)) * r_ap).astype(np.float32)
    lam = rng.uniform(0.45, 0.65, n).astype(np.float32)

    s5_ref, _, trans_ref = lt_sample_aperture(
        lens, jnp.asarray(scene), jnp.asarray(ap), jnp.asarray(lam),
        iterations=5,
    )
    kern = build_po_backward_kernel(lens, iterations=5, interpret=True)
    sx, sy, sdx, sdy, trans = kern(
        jnp.asarray(scene[:, 0]), jnp.asarray(scene[:, 1]),
        jnp.asarray(scene[:, 2]), jnp.asarray(ap[:, 0]),
        jnp.asarray(ap[:, 1]), jnp.asarray(lam),
    )
    ref = np.asarray(s5_ref)
    np.testing.assert_allclose(np.asarray(sx), ref[:, 0], rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sy), ref[:, 1], rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sdx), ref[:, 2], rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(sdy), ref[:, 3], rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(trans), np.asarray(trans_ref), rtol=2e-4, atol=5e-4
    )


def test_backward_kernel_matches_pure(synthetic_lens):
    lens = synthetic_lens
    rng = np.random.default_rng(11)
    n = 300
    scene = np.stack(
        [
            rng.uniform(-60, 60, n),
            rng.uniform(-60, 60, n),
            rng.uniform(300, 2500, n),
        ],
        -1,
    ).astype(np.float32)
    ap = (rng.uniform(-1, 1, (n, 2)) * 8.0).astype(np.float32)
    lam = np.full((n,), 0.55, np.float32)

    s5_ref, _, trans_ref = lt_sample_aperture(
        lens, jnp.asarray(scene), jnp.asarray(ap), jnp.asarray(lam),
        iterations=5,
    )

    kern = build_po_backward_kernel(lens, iterations=5, interpret=True)
    sx, sy, sdx, sdy, trans = kern(
        jnp.asarray(scene[:, 0]), jnp.asarray(scene[:, 1]),
        jnp.asarray(scene[:, 2]), jnp.asarray(ap[:, 0]),
        jnp.asarray(ap[:, 1]), jnp.asarray(lam),
    )
    ref = np.asarray(s5_ref)
    np.testing.assert_allclose(np.asarray(sx), ref[:, 0], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sy), ref[:, 1], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sdx), ref[:, 2], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sdy), ref[:, 3], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(trans), np.asarray(trans_ref), rtol=1e-4, atol=2e-4
    )
