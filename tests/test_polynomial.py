"""Tests for sparse polynomial evaluation and the Newton solvers."""
import numpy as np
import jax.numpy as jnp

from pota_tpu.optics.polynomial import PolyFunction, poly_eval
from pota_tpu.optics.fit import monomial_exponents, _design_matrix


def _random_poly(rng, n_out=3, degree=3):
    exps = monomial_exponents(degree)
    coeffs = rng.normal(size=(n_out, len(exps))).astype(np.float32) * 0.1
    return PolyFunction(
        exponents=jnp.asarray(exps),
        coeffs=jnp.asarray(coeffs),
        in_scale=jnp.ones(5),
        in_shift=jnp.zeros(5),
        max_degree=degree,
    )


def test_poly_eval_matches_numpy(rng_np):
    fn = _random_poly(rng_np)
    x = rng_np.uniform(-1, 1, (64, 5)).astype(np.float32)
    got = np.asarray(poly_eval(fn, jnp.asarray(x)))
    A = _design_matrix(x, np.asarray(fn.exponents))
    want = A @ np.asarray(fn.coeffs).T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_poly_eval_conditioning(rng_np):
    fn = _random_poly(rng_np)
    fn2 = PolyFunction(
        exponents=fn.exponents,
        coeffs=fn.coeffs,
        in_scale=jnp.asarray([0.5, 0.5, 2.0, 2.0, 5.0]),
        in_shift=jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.55]),
        max_degree=fn.max_degree,
    )
    x = rng_np.uniform(-1, 1, (8, 5)).astype(np.float32)
    scaled = (x - np.asarray(fn2.in_shift)) * np.asarray(fn2.in_scale)
    got = np.asarray(poly_eval(fn2, jnp.asarray(x)))
    want = np.asarray(poly_eval(fn, jnp.asarray(scaled)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_pt_sample_aperture_solves_linear_lens():
    """On an exactly-linear 'lens', Newton must land on the analytic answer."""
    from pota_tpu.optics.polynomial import PolyLens, pt_sample_aperture, aperture_xy

    # aperture map: ap = p + d * z_ap (pinhole-free straight propagation)
    z_ap = 30.0
    exps = monomial_exponents(1)  # [1 + 5] terms: const + each var

    def lin_coeffs(sel):  # dict var->coef
        c = np.zeros((len(exps),), np.float32)
        for v, w in sel.items():
            idx = [i for i, e in enumerate(exps)
                   if list(e) == [1 if j == v else 0 for j in range(5)]]
            c[idx[0]] = w
        return c

    ap_coeffs = np.stack([
        lin_coeffs({0: 1.0, 2: z_ap}),
        lin_coeffs({1: 1.0, 3: z_ap}),
    ])
    ap_fn = PolyFunction(
        exponents=jnp.asarray(exps), coeffs=jnp.asarray(ap_coeffs),
        in_scale=jnp.ones(5), in_shift=jnp.zeros(5), max_degree=1,
    )
    lens = PolyLens(
        pt=ap_fn, ap=ap_fn, lens_length=50.0, back_focal_length=30.0,
        efl=50.0, aperture_z=z_ap, aperture_housing_radius=10.0,
        inner_pupil_radius=15.0, outer_pupil_radius=20.0,
        inner_pupil_curvature_radius=30.0, outer_pupil_curvature_radius=40.0,
        fov=0.6, fstop=2.0, aperture_radius_at_fstop=10.0, name="linear",
    )

    sensor5 = jnp.asarray([[1.0, -2.0, 0.0, 0.0, 0.55],
                           [0.0, 0.0, 0.0, 0.0, 0.55]])
    target = jnp.asarray([[3.0, 4.0], [-5.0, 2.0]])
    solved = np.asarray(pt_sample_aperture(lens, sensor5, target, iterations=4))
    # analytic: d = (target - p) / z_ap
    want_dx = (np.asarray(target)[:, 0] - np.asarray(sensor5)[:, 0]) / z_ap
    want_dy = (np.asarray(target)[:, 1] - np.asarray(sensor5)[:, 1]) / z_ap
    np.testing.assert_allclose(solved[:, 2], want_dx, atol=1e-5)
    np.testing.assert_allclose(solved[:, 3], want_dy, atol=1e-5)
    # and the aperture map confirms the hit
    ap = np.asarray(aperture_xy(lens, jnp.asarray(solved)))
    np.testing.assert_allclose(ap, np.asarray(target), atol=1e-4)
