"""Sparse polynomial light-field transforms (the heart of the PO camera).

The reference dispatches per-lens *generated C code* for three functions
(zpelgrims/pota ``src/lentil.h:1257-1313`` + Appendix A of SURVEY.md):

* ``pt_evaluate``       sensor 5-D light field -> outer-pupil chart + transmittance
* ``pt_sample_aperture``solve sensor directions so the ray hits an aperture point
* ``lt_sample_aperture``solve the sensor point for a (scene point, aperture point) pair

The TPU build replaces codegen with *data*: a shared sparse-monomial table
``(exponents [T,5], coeffs [O,T])`` evaluated as one batched matmul — the
same kernel serves all 44 lenses, is differentiable (coefficients are just
arrays -> lens-coefficient gradients come for free), and maps onto the MXU.
The two solver functions become fixed-iteration Newton solves using exact
polynomial Jacobians via ``jax.jacfwd`` — replacing the reference's
generated Newton code (see ``tests/aperture_sampling_debug/newton-w4.py``).

Inputs follow the reference chart: [x, y, dx, dy, lambda_um] in mm at the
unshifted sensor plane.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import geometry as geo


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PolyFunction:
    """One fitted polynomial map R^5 -> R^O with a shared sparse term set."""

    exponents: jnp.ndarray  # [T, 5] int32, total degree bounded
    coeffs: jnp.ndarray     # [O, T] float32
    # per-variable scale applied before evaluation (conditioning)
    in_scale: jnp.ndarray   # [5]

    def tree_flatten(self):
        return (self.exponents, self.coeffs, self.in_scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_degree(self) -> int:
        return int(self.exponents.sum(-1).max())


def poly_eval(fn: PolyFunction, x5):
    """Evaluate the sparse polynomial at points ``x5`` [..., 5] -> [..., O].

    Monomials are built from a per-variable power table (one gather + product)
    and contracted against the coefficient matrix — on TPU the contraction is
    an MXU matmul over [N, T] @ [T, O].
    """
    x = x5 * fn.in_scale
    max_deg = int(jax.core.concrete_or_error(
        int, fn.exponents.max(), "poly exponents must be static"
    ))
    # powers[..., v, d] = x_v ** d
    pows = [jnp.ones_like(x)]
    for _ in range(max_deg):
        pows.append(pows[-1] * x)
    powers = jnp.stack(pows, -1)  # [..., 5, D+1]
    # gather monomial factors: [..., T, 5]
    factors = jnp.take_along_axis(
        powers[..., None, :, :],
        jnp.broadcast_to(
            fn.exponents[..., None], fn.exponents.shape
        )[None, ...].reshape((1,) * (x.ndim - 1) + fn.exponents.shape + (1,)).squeeze(-1)[..., None]
        if False else
        jnp.broadcast_to(fn.exponents[:, :, None], fn.exponents.shape + (1,)),
        axis=-1,
    ).squeeze(-1)
    monomials = jnp.prod(factors, axis=-1)  # [..., T]
    return monomials @ fn.coeffs.T  # [..., O]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PolyLens:
    """A fitted lens: polynomial maps + scalar constants.

    Mirrors the per-lens contract of the reference's generated headers
    (SURVEY.md Appendix A): `pt` is pt_evaluate (outputs x,y,dx,dy on the
    outer-pupil chart + transmittance), `ap` is the sensor->aperture-plane
    map (outputs ap_x, ap_y) that powers both solver functions.
    """

    pt: PolyFunction
    ap: PolyFunction
    # constants (static python floats; see LensSystem / reference lens_constants.h)
    lens_length: float
    back_focal_length: float
    efl: float
    aperture_z: float
    aperture_housing_radius: float
    inner_pupil_radius: float
    outer_pupil_radius: float
    inner_pupil_curvature_radius: float
    outer_pupil_curvature_radius: float
    fov: float
    fstop: float                    # wide-open f-number
    aperture_radius_at_fstop: float  # wide-open iris radius (mm)
    name: str = "unnamed"

    def tree_flatten(self):
        meta = (
            self.lens_length, self.back_focal_length, self.efl,
            self.aperture_z, self.aperture_housing_radius,
            self.inner_pupil_radius, self.outer_pupil_radius,
            self.inner_pupil_curvature_radius,
            self.outer_pupil_curvature_radius, self.fov, self.fstop,
            self.aperture_radius_at_fstop, self.name,
        )
        return (self.pt, self.ap), meta

    @classmethod
    def tree_unflatten(cls, meta, children):
        return cls(children[0], children[1], *meta)


# ------------------------------------------------------------------ pt_evaluate


def pt_evaluate(lens: PolyLens, sensor5):
    """Sensor light field -> (out4 chart, transmittance>=0).

    Equivalent of the reference's lens_evaluate (src/lentil.h:1257-1266).
    """
    out = poly_eval(lens.pt, sensor5)
    return out[..., :4], jnp.maximum(out[..., 4], 0.0)


def aperture_xy(lens: PolyLens, sensor5):
    """Sensor light field -> hit position on the iris plane [..., 2]."""
    return poly_eval(lens.ap, sensor5)


# ----------------------------------------------------------- pt_sample_aperture


def pt_sample_aperture(lens: PolyLens, sensor5, ap_target, iterations: int = 8):
    """Solve sensor directions (dx, dy) so the ray hits ``ap_target`` on the iris.

    Newton iteration with the exact 2x2 Jacobian of the aperture polynomial
    (replaces the generated solver, ref src/lentil.h:1272-1291).  Returns the
    updated sensor light field.
    """
    x, y, lam = sensor5[..., 0], sensor5[..., 1], sensor5[..., 4]
    # init: straight line to the aperture point
    dx0 = (ap_target[..., 0] - x) / lens.aperture_z
    dy0 = (ap_target[..., 1] - y) / lens.aperture_z

    def residual(d, xi, yi, li, ti):
        s = jnp.stack([xi, yi, d[0], d[1], li], -1)
        return poly_eval(lens.ap, s) - ti

    res_jac = jax.jacfwd(residual)

    def one_point(xi, yi, li, ti, d0):
        def body(_, d):
            r = residual(d, xi, yi, li, ti)
            jac = res_jac(d, xi, yi, li, ti)
            det = jac[0, 0] * jac[1, 1] - jac[0, 1] * jac[1, 0]
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            delta0 = (jac[1, 1] * r[0] - jac[0, 1] * r[1]) / det
            delta1 = (-jac[1, 0] * r[0] + jac[0, 0] * r[1]) / det
            return d - jnp.stack([delta0, delta1])

        return jax.lax.fori_loop(0, iterations, body, d0)

    flat = lambda a: a.reshape(-1)
    d0 = jnp.stack([flat(dx0), flat(dy0)], -1)
    solved = jax.vmap(one_point)(
        flat(x), flat(y), flat(lam),
        ap_target.reshape(-1, 2), d0
    )
    solved = solved.reshape(sensor5.shape[:-1] + (2,))
    return jnp.concatenate(
        [sensor5[..., :2], solved, sensor5[..., 4:5]], -1
    )


# ----------------------------------------------------------- lt_sample_aperture


def _chart_to_cs(lens: PolyLens, out4):
    R = lens.outer_pupil_curvature_radius
    return geo.sphere_to_cs(out4[..., :2], out4[..., 2:4], -R, R)


def lt_sample_aperture(lens: PolyLens, scene_point, ap_point, lam,
                       iterations: int = 8):
    """Solve the sensor light field for a (scene point, aperture point) pair.

    Newton over (x, y, dx, dy): 2 residuals pin the iris crossing to
    ``ap_point``; 2 pin the exit ray to pass through ``scene_point``
    (perpendicular offset at the scene depth).  Replaces the generated
    lt_sample_aperture (ref src/lentil.h:1296-1313).

    Args:
      scene_point: [..., 3] camera-space point in *lens space* mm
        (+z toward the scene — the reference passes
        ``-camera_space_position * 10`` for cm scenes).
      ap_point: [..., 2] target on the iris plane (mm).
      lam: wavelength in um.

    Returns (sensor5, out4, transmittance): transmittance already cropped by
    the outer pupil radius like the generated code.
    """

    def residual(s4, li, scn, ti):
        s = jnp.concatenate([s4, li[None]], -1)
        ap = poly_eval(lens.ap, s) - ti
        out = poly_eval(lens.pt, s)
        pos, direction = _chart_to_cs(lens, out[:4])
        # shift chart frame (front vertex at z=0) to lens space
        front_z = lens.back_focal_length + lens.lens_length
        t = (scn[2] - (pos[2] + front_z)) / jnp.where(
            jnp.abs(direction[2]) < 1e-9, 1e-9, direction[2]
        )
        hit_xy = pos[:2] + t * direction[:2]
        return jnp.concatenate([ap, hit_xy - scn[:2]], -1)

    res_jac = jax.jacfwd(residual)

    def one_point(scn, ti, li):
        # init: chief-ray estimate through the lens center
        x0 = -scn[0] * lens.back_focal_length / scn[2]
        y0 = -scn[1] * lens.back_focal_length / scn[2]
        dx0 = (ti[0] - x0) / lens.aperture_z
        dy0 = (ti[1] - y0) / lens.aperture_z
        s0 = jnp.stack([x0, y0, dx0, dy0])

        def body(_, s4):
            r = residual(s4, li, scn, ti)
            jac = res_jac(s4, li, scn, ti)
            delta = jnp.linalg.solve(
                jac + 1e-9 * jnp.eye(4, dtype=jac.dtype), r
            )
            return s4 - delta

        return jax.lax.fori_loop(0, iterations, body, s0)

    scene_flat = scene_point.reshape(-1, 3)
    ap_flat = jnp.broadcast_to(ap_point, scene_point.shape[:-1] + (2,)).reshape(-1, 2)
    lam_flat = jnp.broadcast_to(lam, scene_point.shape[:-1]).reshape(-1)
    s4 = jax.vmap(one_point)(scene_flat, ap_flat, lam_flat)
    s4 = s4.reshape(scene_point.shape[:-1] + (4,))
    lam_b = jnp.broadcast_to(lam, scene_point.shape[:-1])
    sensor5 = jnp.concatenate([s4, lam_b[..., None]], -1)

    out4, trans = pt_evaluate(lens, sensor5)
    r2 = out4[..., 0] ** 2 + out4[..., 1] ** 2
    trans = jnp.where(r2 > lens.outer_pupil_radius**2, 0.0, trans)
    return sensor5, out4, trans


def inner_pupil_ok(lens: PolyLens, sensor5):
    """Crop at the inward-facing pupil (ref src/lentil.h:369-374, 640-645)."""
    px = sensor5[..., 0] + sensor5[..., 2] * lens.back_focal_length
    py = sensor5[..., 1] + sensor5[..., 3] * lens.back_focal_length
    return px * px + py * py <= lens.inner_pupil_radius**2
