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
    """One fitted polynomial map R^5 -> R^O with a shared sparse term set.

    ``exponents`` is STATIC (compile-time) data: the monomial structure is
    baked into the program as a chain of fused elementwise multiplies, while
    ``coeffs`` stays a live array (the differentiable surface for
    lens-coefficient gradients).
    """

    exponents: tuple        # T-tuple of 5-tuples of ints (static aux data)
    coeffs: jnp.ndarray     # [O, T] float32
    # input conditioning applied before evaluation: (x - shift) * scale
    in_scale: jnp.ndarray   # [5]
    in_shift: jnp.ndarray   # [5]
    max_degree: int = 0     # static so power tables unroll at trace time

    def __post_init__(self):
        if not isinstance(self.exponents, tuple):
            import numpy as _np

            self.exponents = tuple(
                tuple(int(v) for v in row)
                for row in _np.asarray(self.exponents)
            )

    def tree_flatten(self):
        return (self.coeffs, self.in_scale, self.in_shift), (
            self.exponents,
            self.max_degree,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], *children, max_degree=aux[1])


def monomial_basis(exponents: tuple, x, max_degree: int):
    """Monomials [..., T] for inputs x [..., 5] with static exponents.

    Emits one multiply per nonzero exponent entry using precomputed power
    tables — pure fused VPU elementwise work, no gathers, no [T, 5]
    intermediates.
    """
    # powers[v][d] = x_v ** d, each [...]
    powers = []
    for v in range(5):
        col = [None, x[..., v]]
        for d in range(2, max_degree + 1):
            col.append(col[-1] * x[..., v])
        powers.append(col)
    ones = jnp.ones_like(x[..., 0])
    monos = []
    for term in exponents:
        m = None
        for v, e in enumerate(term):
            if e:
                f = powers[v][e]
                m = f if m is None else m * f
        monos.append(ones if m is None else m)
    return jnp.stack(monos, -1)


def poly_eval(fn: PolyFunction, x5):
    """Evaluate the sparse polynomial at points ``x5`` [..., 5] -> [..., O].

    The monomial basis is fused elementwise work; the contraction
    [N, T] @ [T, O] maps onto the MXU.

    The contraction is pinned to ``Precision.HIGHEST``: at the TPU default
    the MXU runs it in single-pass bf16, whose ~8-bit mantissa puts ~1mm of
    noise on the coefficient cancellation (coeff magnitudes reach 1e3 while
    outputs are ~1e1 mm) — enough to stall the backward Newton solves at a
    ~0.8mm residual plateau and visibly blur bokeh edges.  HIGHEST costs
    3-6 bf16 passes but restores true f32 accuracy; the hot production
    paths use the fused Pallas kernels (f32 VPU) and never pay it.
    """
    x = (x5 - fn.in_shift) * fn.in_scale
    monomials = monomial_basis(fn.exponents, x, fn.max_degree)
    return jnp.matmul(
        monomials, fn.coeffs.T, precision=jax.lax.Precision.HIGHEST
    )  # [..., O]


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
    # pupil chart geometry ("sphere" / "cyl-x" / "cyl-y") — the reference's
    # per-lens lens_inner/outer_pupil_geometry dispatch (src/lentil.h:387-389)
    outer_chart: str = "sphere"
    inner_chart: str = "sphere"

    def tree_flatten(self):
        meta = (
            self.lens_length, self.back_focal_length, self.efl,
            self.aperture_z, self.aperture_housing_radius,
            self.inner_pupil_radius, self.outer_pupil_radius,
            self.inner_pupil_curvature_radius,
            self.outer_pupil_curvature_radius, self.fov, self.fstop,
            self.aperture_radius_at_fstop, self.name,
            self.outer_chart, self.inner_chart,
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


def _batched_jacobian(res_fn, s, n_unknowns: int):
    """Residual + Jacobian columns, fully batched.

    ``res_fn``: [..., n_unknowns] -> [..., n_res].  Returns
    (residual [..., n_res], jac [..., n_res, n_unknowns]).  Uses
    ``jax.linearize`` so the primal evaluates once and each Jacobian column
    is a cheap tangent pull — every pass is a plain batched polynomial
    evaluation that maps straight onto the MXU (no per-point jacfwd+vmap).
    """
    r, lin = jax.linearize(res_fn, s)
    cols = []
    for i in range(n_unknowns):
        tangent = jnp.zeros_like(s).at[..., i].set(1.0)
        cols.append(lin(tangent))
    return r, jnp.stack(cols, -1)


def _solve2(a, b, c, d, r0, r1):
    """Closed-form 2x2 solve [[a,b],[c,d]] x = r."""
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return (d * r0 - b * r1) / det, (-c * r0 + a * r1) / det


def _solve4_blocked(jac, r):
    """Closed-form batched 4x4 solve via 2x2-block Schur complement.

    Replaces batched LU (``jnp.linalg.solve``) in the Newton inner loop —
    pure fused elementwise arithmetic, no library solve.
    """
    A = jac[..., :2, :2]
    B = jac[..., :2, 2:]
    C = jac[..., 2:, :2]
    D = jac[..., 2:, 2:]
    r1, r2 = r[..., :2], r[..., 2:]

    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    detA = a * d - b * c
    detA = jnp.where(jnp.abs(detA) < 1e-12, 1e-12, detA)
    inv = 1.0 / detA
    # A^{-1} = [[d,-b],[-c,a]] / detA
    Ainv00, Ainv01 = d * inv, -b * inv
    Ainv10, Ainv11 = -c * inv, a * inv

    def Ainv_mat(m):  # A^{-1} @ m for m [..., 2, k]
        row0 = Ainv00[..., None] * m[..., 0, :] + Ainv01[..., None] * m[..., 1, :]
        row1 = Ainv10[..., None] * m[..., 0, :] + Ainv11[..., None] * m[..., 1, :]
        return jnp.stack([row0, row1], -2)

    def Ainv_vec(v):  # A^{-1} @ v for v [..., 2]
        return jnp.stack(
            [Ainv00 * v[..., 0] + Ainv01 * v[..., 1],
             Ainv10 * v[..., 0] + Ainv11 * v[..., 1]], -1
        )

    AinvB = Ainv_mat(B)                               # [..., 2, 2]
    S = D - jnp.einsum("...ik,...kj->...ij", C, AinvB,
                       precision=jax.lax.Precision.HIGHEST)  # Schur complement
    rhs2 = r2 - jnp.einsum("...ik,...k->...i", C, Ainv_vec(r1),
                           precision=jax.lax.Precision.HIGHEST)
    x2_0, x2_1 = _solve2(
        S[..., 0, 0], S[..., 0, 1], S[..., 1, 0], S[..., 1, 1],
        rhs2[..., 0], rhs2[..., 1],
    )
    x2 = jnp.stack([x2_0, x2_1], -1)
    x1 = Ainv_vec(r1 - jnp.einsum("...ik,...k->...i", B, x2,
                                  precision=jax.lax.Precision.HIGHEST))
    return jnp.concatenate([x1, x2], -1)


def _linear_solve_from_fn(g, y, n_unknowns: int):
    """Solve the batched linear system g(x) = y given only the linear map g.

    Builds the per-point Jacobian by evaluating g on basis vectors (g is a
    block-diagonal batch of small dense systems) and solves in closed form.
    Used as ``tangent_solve`` for lax.custom_root.
    """
    cols = []
    for i in range(n_unknowns):
        e = jnp.zeros_like(y).at[..., i].set(1.0)
        cols.append(g(e))
    jac = jnp.stack(cols, -1)  # [..., n, n]
    if n_unknowns == 2:
        x0, x1 = _solve2(
            jac[..., 0, 0], jac[..., 0, 1], jac[..., 1, 0], jac[..., 1, 1],
            y[..., 0], y[..., 1],
        )
        return jnp.stack([x0, x1], -1)
    return _solve4_blocked(jac, y)


def pt_sample_aperture(lens: PolyLens, sensor5, ap_target, iterations: int = 3):
    """Solve sensor directions (dx, dy) so the ray hits ``ap_target`` on the iris.

    Batched Newton with the exact 2x2 Jacobian of the aperture polynomial
    (replaces the generated solver, ref src/lentil.h:1272-1291), wrapped in
    ``lax.custom_root`` so gradients w.r.t. the lens coefficients use the
    implicit function theorem (one linear solve) instead of unrolling the
    iteration — essential for cheap lens-coefficient training.  Returns the
    updated sensor light field.
    """
    x, y, lam = sensor5[..., 0], sensor5[..., 1], sensor5[..., 4]
    # init: straight line to the aperture point
    d0 = jnp.stack(
        [
            (ap_target[..., 0] - x) / lens.aperture_z,
            (ap_target[..., 1] - y) / lens.aperture_z,
        ],
        -1,
    )

    def residual(d):
        s = jnp.stack([x, y, d[..., 0], d[..., 1], lam], -1)
        return poly_eval(lens.ap, s) - ap_target

    def newton_solve(res_fn, d_init):
        def body(_, d):
            r, jac = _batched_jacobian(res_fn, d, 2)
            det = (
                jac[..., 0, 0] * jac[..., 1, 1]
                - jac[..., 0, 1] * jac[..., 1, 0]
            )
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            d0_ = (jac[..., 1, 1] * r[..., 0] - jac[..., 0, 1] * r[..., 1]) / det
            d1_ = (-jac[..., 1, 0] * r[..., 0] + jac[..., 0, 0] * r[..., 1]) / det
            return d - jnp.stack([d0_, d1_], -1)

        return jax.lax.fori_loop(0, iterations, body, d_init)

    solved = jax.lax.custom_root(
        residual, d0, newton_solve,
        lambda g, y2: _linear_solve_from_fn(g, y2, 2),
    )
    return jnp.concatenate(
        [sensor5[..., :2], solved, sensor5[..., 4:5]], -1
    )


# ----------------------------------------------------------- lt_sample_aperture


def _chart_to_cs(lens: PolyLens, out4):
    R = lens.outer_pupil_curvature_radius
    return geo.chart_to_cs(out4[..., :2], out4[..., 2:4], -R, R,
                           lens.outer_chart)


def lt_sample_aperture(lens: PolyLens, scene_point, ap_point, lam,
                       iterations: int = 5):
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

    lam_b = jnp.broadcast_to(lam, scene_point.shape[:-1])
    ap_b = jnp.broadcast_to(ap_point, scene_point.shape[:-1] + (2,))
    front_z = lens.back_focal_length + lens.lens_length

    def residual(s4):
        s = jnp.concatenate([s4, lam_b[..., None]], -1)
        ap = poly_eval(lens.ap, s) - ap_b
        out = poly_eval(lens.pt, s)
        pos, direction = _chart_to_cs(lens, out[..., :4])
        # shift chart frame (front vertex at z=0) to lens space
        dz = jnp.where(
            jnp.abs(direction[..., 2]) < 1e-9, 1e-9, direction[..., 2]
        )
        t = (scene_point[..., 2] - (pos[..., 2] + front_z)) / dz
        hit_xy = pos[..., :2] + t[..., None] * direction[..., :2]
        return jnp.concatenate([ap, hit_xy - scene_point[..., :2]], -1)

    # init: chief-ray estimate through the lens center
    x0 = -scene_point[..., 0] * lens.back_focal_length / scene_point[..., 2]
    y0 = -scene_point[..., 1] * lens.back_focal_length / scene_point[..., 2]
    s0 = jnp.stack(
        [
            x0,
            y0,
            (ap_b[..., 0] - x0) / lens.aperture_z,
            (ap_b[..., 1] - y0) / lens.aperture_z,
        ],
        -1,
    )

    def newton_solve(res_fn, s_init):
        def body(_, s4):
            r, jac = _batched_jacobian(res_fn, s4, 4)
            delta = _solve4_blocked(jac, r)
            return s4 - delta

        return jax.lax.fori_loop(0, iterations, body, s_init)

    # custom_root: implicit-function-theorem gradients (one 4x4 solve in the
    # backward pass instead of differentiating the unrolled iteration)
    s4 = jax.lax.custom_root(
        residual, s0, newton_solve,
        lambda g, y4: _linear_solve_from_fn(g, y4, 4),
    )
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
