"""Polynomial fitting: element-tracer ground truth -> sparse poly tables.

This is the TPU build's replacement for the reference's offline codegen
pipeline (the unmounted sibling repo ``polynomial-optics`` that produced the
per-lens ``pt_evaluate.h`` etc. headers, SURVEY.md C14/§7.2): sample the
5-D sensor light field, trace each ray through the element stack
(:mod:`pota_tpu.optics.raytrace`), and least-squares fit degree-truncated
polynomials for the outer-pupil chart outputs, transmittance, and the
sensor->iris map.  Fits are cached as .npz next to the repo so renders
never refit.

The fit domain is scaled per lens (sensor extent from the sensor diagonal,
direction extent from the rear-pupil geometry) and inputs are conditioned
to ~[-1, 1] before the normal equations — both essential for f32 evaluation
on TPU afterwards.
"""
from __future__ import annotations

import itertools
import os

import numpy as np
import jax.numpy as jnp

from .polynomial import PolyFunction, PolyLens
from .raytrace import LensSystem, trace_to_chart

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data", "lenses",
)


def monomial_exponents(degree: int, nvars: int = 5) -> np.ndarray:
    """All exponent tuples with total degree <= degree, ordered by degree."""
    exps = [
        e
        for e in itertools.product(range(degree + 1), repeat=nvars)
        if sum(e) <= degree
    ]
    exps.sort(key=lambda e: (sum(e), e))
    return np.asarray(exps, np.int32)


def _design_matrix(x: np.ndarray, exps: np.ndarray) -> np.ndarray:
    """[N, 5] inputs, [T, 5] exponents -> [N, T] monomials in float64."""
    x = np.asarray(x, np.float64)
    max_deg = int(exps.max())
    powers = np.ones((x.shape[0], 5, max_deg + 1))
    for d in range(1, max_deg + 1):
        powers[:, :, d] = powers[:, :, d - 1] * x
    return powers[:, np.arange(5)[None, :], exps].prod(-1)


def sample_fit_domain(lens: LensSystem, n: int, seed: int = 0,
                      sensor_extent: float | None = None):
    """Draw training sensor light-field samples [n, 5] (numpy f32)."""
    rng = np.random.default_rng(seed)
    r_sensor = sensor_extent or 25.0  # covers a 36mm-wide sensor diagonal
    d_max = (lens.inner_pupil_radius + r_sensor) / lens.back_focal_length
    x = rng.uniform(-r_sensor, r_sensor, n)
    y = rng.uniform(-r_sensor, r_sensor, n)
    # aim directions at the rear-element clear aperture (with margin) instead
    # of sampling slopes blind — raises the valid fraction of training rays
    # from ~2% to tens of percent without shrinking the usable domain
    phi = rng.uniform(0.0, 2 * np.pi, n)
    rr = lens.inner_pupil_radius * 1.15 * np.sqrt(rng.uniform(0.0, 1.0, n))
    tx = rr * np.cos(phi)
    ty = rr * np.sin(phi)
    dx = (tx - x) / lens.back_focal_length
    dy = (ty - y) / lens.back_focal_length
    lam = rng.uniform(0.38, 0.78, n)
    return np.stack([x, y, dx, dy, lam], -1).astype(np.float32), r_sensor, d_max


def _condition(r_sensor: float, d_max: float):
    scale = np.array([1.0 / r_sensor, 1.0 / r_sensor, 1.0 / d_max, 1.0 / d_max, 5.0],
                     np.float32)
    shift = np.array([0.0, 0.0, 0.0, 0.0, 0.55], np.float32)
    return scale, shift


def _select_terms(exps, coefs_list, design, keep: int):
    """Prune to the ``keep`` most important terms (shared across outputs)."""
    t = design.shape[1]
    if keep >= t:
        return np.arange(t)
    mono_rms = np.sqrt((design**2).mean(0))
    score = np.zeros(t)
    for c in coefs_list:
        contrib = np.abs(c) * mono_rms
        score += contrib / max(contrib.max(), 1e-30)
    score[0] = np.inf  # always keep the constant term
    return np.sort(np.argsort(-score)[:keep])


def fit_lens(lens: LensSystem, degree: int = 5, n_samples: int = 200_000,
             max_terms: int = 160, seed: int = 0,
             return_diagnostics: bool = False):
    """Fit a PolyLens to an element stack.

    Returns (PolyLens, diagnostics dict) — rms errors per output on a held
    out split, in mm / slope units.
    """
    samples, r_sensor, d_max = sample_fit_domain(lens, n_samples, seed)
    out, trans, ap_xy, valid = (
        np.asarray(a) for a in trace_to_chart(lens, jnp.asarray(samples))
    )
    scale, shift = _condition(r_sensor, d_max)
    xs = (samples - shift) * scale

    exps = monomial_exponents(degree)
    n_train = int(0.9 * len(xs))
    A = _design_matrix(xs[:n_train], exps)
    A_test = _design_matrix(xs[n_train:], exps)
    v_train, v_test = valid[:n_train], valid[n_train:]

    def lstsq(Amat, b):
        coef, *_ = np.linalg.lstsq(Amat, b, rcond=None)
        return coef

    # geometry outputs fit on valid rays only; transmittance on all rays
    geo_targets = np.concatenate([out[:n_train], ap_xy[:n_train]], -1)
    coefs_geo = lstsq(A[v_train], geo_targets[v_train])       # [T, 6]
    coef_trans = lstsq(A, np.where(v_train, trans[:n_train], 0.0)[:, None])

    # shared-term pruning + refit
    sel = _select_terms(
        exps,
        [coefs_geo[:, i] for i in range(6)] + [coef_trans[:, 0]],
        A[v_train],
        max_terms,
    )
    exps_s = exps[sel]
    A_s = A[:, sel]
    coefs_geo = lstsq(A_s[v_train], geo_targets[v_train])
    coef_trans = lstsq(A_s, np.where(v_train, trans[:n_train], 0.0)[:, None])

    # diagnostics on held-out valid rays
    A_t = A_test[:, sel]
    pred_geo = A_t[v_test] @ coefs_geo
    geo_true = np.concatenate([out[n_train:], ap_xy[n_train:]], -1)[v_test]
    rms = np.sqrt(((pred_geo - geo_true) ** 2).mean(0))
    trans_rms = float(
        np.sqrt(
            ((A_t @ coef_trans)[:, 0] - np.where(v_test, trans[n_train:], 0.0)) ** 2
        ).mean()
    )

    pt = PolyFunction(
        exponents=jnp.asarray(exps_s),
        coeffs=jnp.asarray(
            np.concatenate([coefs_geo[:, :4], coef_trans], -1).T, jnp.float32
        ),
        in_scale=jnp.asarray(scale),
        in_shift=jnp.asarray(shift),
        max_degree=int(exps_s.max()),
    )
    ap = PolyFunction(
        exponents=jnp.asarray(exps_s),
        coeffs=jnp.asarray(coefs_geo[:, 4:6].T, jnp.float32),
        in_scale=jnp.asarray(scale),
        in_shift=jnp.asarray(shift),
        max_degree=int(exps_s.max()),
    )
    poly = PolyLens(
        pt=pt,
        ap=ap,
        lens_length=lens.lens_length,
        back_focal_length=lens.back_focal_length,
        efl=lens.efl,
        aperture_z=lens.aperture_z,
        aperture_housing_radius=lens.aperture_housing_radius,
        inner_pupil_radius=lens.inner_pupil_radius,
        outer_pupil_radius=lens.outer_pupil_radius,
        inner_pupil_curvature_radius=lens.inner_pupil_curvature_radius,
        outer_pupil_curvature_radius=lens.outer_pupil_curvature_radius,
        fov=lens.fov,
        fstop=lens.efl / (2.0 * lens.aperture_housing_radius),
        aperture_radius_at_fstop=lens.aperture_housing_radius,
        name=lens.name,
        outer_chart=lens.outer_chart,
        inner_chart=lens.inner_chart,
    )
    diag = {
        "rms_out_x": float(rms[0]), "rms_out_y": float(rms[1]),
        "rms_out_dx": float(rms[2]), "rms_out_dy": float(rms[3]),
        "rms_ap_x": float(rms[4]), "rms_ap_y": float(rms[5]),
        "rms_trans": trans_rms,
        "valid_frac": float(valid.mean()),
        "n_terms": int(len(sel)),
    }
    if return_diagnostics:
        return poly, diag
    return poly


# ------------------------------------------------------------------ caching --


def _cache_path(name: str, degree: int) -> str:
    return os.path.join(_CACHE_DIR, f"{name}__deg{degree}.npz")


def save_poly_lens(poly: PolyLens, degree: int, path: str | None = None):
    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = path or _cache_path(poly.name, degree)
    np.savez_compressed(
        path,
        pt_exponents=np.asarray(poly.pt.exponents),
        pt_coeffs=np.asarray(poly.pt.coeffs),
        ap_exponents=np.asarray(poly.ap.exponents),
        ap_coeffs=np.asarray(poly.ap.coeffs),
        in_scale=np.asarray(poly.pt.in_scale),
        in_shift=np.asarray(poly.pt.in_shift),
        constants=np.asarray(
            [
                poly.lens_length, poly.back_focal_length, poly.efl,
                poly.aperture_z, poly.aperture_housing_radius,
                poly.inner_pupil_radius, poly.outer_pupil_radius,
                poly.inner_pupil_curvature_radius,
                poly.outer_pupil_curvature_radius, poly.fov, poly.fstop,
                poly.aperture_radius_at_fstop,
            ]
        ),
        name=np.asarray(poly.name),
        charts=np.asarray([poly.outer_chart, poly.inner_chart]),
    )
    return path


def load_poly_lens(name: str, degree: int = 5, path: str | None = None):
    path = path or _cache_path(name, degree)
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=False)
    c = z["constants"]
    mk = lambda e, co: PolyFunction(
        exponents=jnp.asarray(e),
        coeffs=jnp.asarray(co),
        in_scale=jnp.asarray(z["in_scale"]),
        in_shift=jnp.asarray(z["in_shift"]),
        max_degree=int(e.max()),
    )
    return PolyLens(
        pt=mk(z["pt_exponents"], z["pt_coeffs"]),
        ap=mk(z["ap_exponents"], z["ap_coeffs"]),
        lens_length=float(c[0]), back_focal_length=float(c[1]),
        efl=float(c[2]), aperture_z=float(c[3]),
        aperture_housing_radius=float(c[4]), inner_pupil_radius=float(c[5]),
        outer_pupil_radius=float(c[6]),
        inner_pupil_curvature_radius=float(c[7]),
        outer_pupil_curvature_radius=float(c[8]), fov=float(c[9]),
        fstop=float(c[10]), aperture_radius_at_fstop=float(c[11]),
        name=str(z["name"]),
        # charts absent in fits saved before the cylinder dispatch: sphere
        outer_chart=(str(z["charts"][0]) if "charts" in z else "sphere"),
        inner_chart=(str(z["charts"][1]) if "charts" in z else "sphere"),
    )


def get_or_fit_lens(name: str, degree: int = 5, **fit_kwargs):
    """Load a cached fit for a catalog lens, fitting + caching on miss."""
    cached = load_poly_lens(name, degree)
    if cached is not None:
        return cached
    from ..lens.database import get_lens_system

    lens = get_lens_system(name)
    poly = fit_lens(lens, degree=degree, **fit_kwargs)
    save_poly_lens(poly, degree)
    return poly
