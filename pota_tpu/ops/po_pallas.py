"""Pallas TPU kernel: fused polynomial-optics forward trace.

The reference compiles *generated C code per lens* (zpelgrims/pota
``src/lentil.h:1257-1313`` including per-lens Newton solvers).  This kernel
is the TPU-native analog: the sparse polynomial structure AND coefficients
of one fitted lens are baked into the kernel at trace time as immediate
constants, producing one fully-fused VPU program per lens that runs the
whole per-lane pipeline in registers/VMEM:

    init dirs -> Newton iterations on the aperture polynomial (analytic
    dual-number Jacobians, closed-form 2x2 solve) -> sensor shift ->
    pt_evaluate (outer-pupil chart + transmittance)

with zero HBM traffic between stages (the pure-JAX path materializes the
[N, T] monomial tensor per evaluation — HBM-bound; here monomials live in
vector registers).

The kernel is for *rendering*; the differentiable pure-JAX path
(:mod:`pota_tpu.optics.polynomial`) remains the training surface.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..optics.polynomial import PolyLens

LANE = 128
SUBLANE = 8
TILE = SUBLANE * LANE  # rays per grid step


def _poly_static(fn):
    """Extract the static structure (exponents, coeffs, conditioning)."""
    exps = np.asarray(fn.exponents, np.int32)          # [T, 5]
    coeffs = np.asarray(fn.coeffs, np.float64)         # [O, T]
    scale = np.asarray(fn.in_scale, np.float64)        # [5]
    shift = np.asarray(fn.in_shift, np.float64)        # [5]
    return exps, coeffs, scale, shift


def _emit_powers(u, max_deg):
    """List of u**d for d in 0..max_deg (d=0 entry is None, unused)."""
    pows = [None, u]
    for _ in range(2, max_deg + 1):
        pows.append(pows[-1] * u)
    return pows


def build_po_forward_kernel(lens: PolyLens, sensor_shift: float,
                            newton_iterations: int = 3,
                            interpret: bool = False):
    """Build the per-lens fused forward kernel.

    Returns ``fn(x, y, ap_x, ap_y, lam) -> (out4 [N,4], trans [N],
    dx [N], dy [N])`` operating on flat float32 arrays (N padded to a
    multiple of 1024 internally).  All polynomial data is baked in.
    """
    ap_exps, ap_coeffs, scale, shift = _poly_static(lens.ap)
    pt_exps, pt_coeffs, *_ = _poly_static(lens.pt)
    ap_deg = int(ap_exps.max())
    pt_deg = int(pt_exps.max())
    inv_ap_z = 1.0 / lens.aperture_z
    s0, s1, s2, s3, s4 = (float(v) for v in scale)
    sh4 = float(shift[4])

    def kernel(x_ref, y_ref, ax_ref, ay_ref, lam_ref,
               out0_ref, out1_ref, out2_ref, out3_ref, trans_ref,
               dx_ref, dy_ref):
        x = x_ref[:]
        y = y_ref[:]
        ax = ax_ref[:]
        ay = ay_ref[:]
        lam = lam_ref[:]

        # conditioned static vars (constant across Newton iterations)
        ux = x * s0
        uy = y * s1
        ul = (lam - sh4) * s4

        max_static_deg = max(ap_deg, pt_deg)
        px_pows = _emit_powers(ux, max_static_deg)
        py_pows = _emit_powers(uy, max_static_deg)
        pl_pows = _emit_powers(ul, max_static_deg)

        def static_base(e):
            """Product of the x, y, lambda factors of a term (or None)."""
            e0, e1, _, _, e4 = e
            m = None
            for pows, deg in ((px_pows, e0), (py_pows, e1), (pl_pows, e4)):
                if deg:
                    f = pows[deg]
                    m = f if m is None else m * f
            return m

        ap_base = [static_base(e) for e in ap_exps]

        # Newton init: straight line to the aperture point
        dx = (ax - x) * inv_ap_z
        dy = (ay - y) * inv_ap_z

        one = jnp.ones_like(x)

        for _ in range(newton_iterations):
            udx = dx * s2
            udy = dy * s3
            dx_pows = _emit_powers(udx, ap_deg)
            dy_pows = _emit_powers(udy, ap_deg)

            apx = None
            apy = None
            j00 = None  # d apx / d udx
            j01 = None  # d apx / d udy
            j10 = None
            j11 = None

            for t, e in enumerate(ap_exps):
                e2, e3 = int(e[2]), int(e[3])
                base = ap_base[t]
                m2 = dx_pows[e2] if e2 else None
                m3 = dy_pows[e3] if e3 else None

                def mul(*fs):
                    m = None
                    for f in fs:
                        if f is None:
                            continue
                        m = f if m is None else m * f
                    return m if m is not None else one

                mono = mul(base, m2, m3)
                # d mono / d udx
                if e2:
                    dm_dx = mul(base, (dx_pows[e2 - 1] if e2 > 1 else None), m3)
                    if e2 > 1:
                        dm_dx = dm_dx * float(e2)
                    elif dm_dx is one:
                        dm_dx = one * float(e2)
                else:
                    dm_dx = None
                if e3:
                    dm_dy = mul(base, m2, (dy_pows[e3 - 1] if e3 > 1 else None))
                    if e3 > 1:
                        dm_dy = dm_dy * float(e3)
                    elif dm_dy is one:
                        dm_dy = one * float(e3)
                else:
                    dm_dy = None

                cax = float(ap_coeffs[0, t])
                cay = float(ap_coeffs[1, t])
                apx = mono * cax if apx is None else apx + mono * cax
                apy = mono * cay if apy is None else apy + mono * cay
                if dm_dx is not None:
                    j00 = dm_dx * cax if j00 is None else j00 + dm_dx * cax
                    j10 = dm_dx * cay if j10 is None else j10 + dm_dx * cay
                if dm_dy is not None:
                    j01 = dm_dy * cax if j01 is None else j01 + dm_dy * cax
                    j11 = dm_dy * cay if j11 is None else j11 + dm_dy * cay

            # chain rule to raw dx, dy and closed-form 2x2 Newton update
            j00 = j00 * s2
            j10 = j10 * s2
            j01 = j01 * s3
            j11 = j11 * s3
            r0 = apx - ax
            r1 = apy - ay
            det = j00 * j11 - j01 * j10
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            dx = dx - (j11 * r0 - j01 * r1) / det
            dy = dy - (-j10 * r0 + j00 * r1) / det

        # sensor shift onto the polynomial plane (ref src/lentil.h:349-350)
        xs = x + dx * sensor_shift
        ys = y + dy * sensor_shift

        # pt_evaluate at the shifted sensor point
        uxs = xs * s0
        uys = ys * s1
        udx = dx * s2
        udy = dy * s3
        xs_pows = _emit_powers(uxs, pt_deg)
        ys_pows = _emit_powers(uys, pt_deg)
        dx_pows = _emit_powers(udx, pt_deg)
        dy_pows = _emit_powers(udy, pt_deg)
        lam_pows = pl_pows

        acc = [None] * 5
        for t, e in enumerate(pt_exps):
            e0, e1, e2, e3, e4 = (int(v) for v in e)
            m = None
            for pows, deg in (
                (xs_pows, e0), (ys_pows, e1), (dx_pows, e2),
                (dy_pows, e3), (lam_pows, e4),
            ):
                if deg:
                    f = pows[deg]
                    m = f if m is None else m * f
            if m is None:
                m = one
            for o in range(5):
                c = float(pt_coeffs[o, t])
                if c != 0.0:
                    acc[o] = m * c if acc[o] is None else acc[o] + m * c

        out0_ref[:] = acc[0] if acc[0] is not None else jnp.zeros_like(x)
        out1_ref[:] = acc[1] if acc[1] is not None else jnp.zeros_like(x)
        out2_ref[:] = acc[2] if acc[2] is not None else jnp.zeros_like(x)
        out3_ref[:] = acc[3] if acc[3] is not None else jnp.zeros_like(x)
        trans_ref[:] = acc[4] if acc[4] is not None else jnp.zeros_like(x)
        dx_ref[:] = dx
        dy_ref[:] = dy

    @jax.jit
    def fn(x, y, ap_x, ap_y, lam):
        n = x.shape[0]
        n_pad = ((n + TILE - 1) // TILE) * TILE
        pad = lambda a: jnp.pad(a, (0, n_pad - n)).reshape(-1, LANE)
        rows = n_pad // LANE
        grid = rows // SUBLANE
        spec = pl.BlockSpec((SUBLANE, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[spec] * 5,
            out_specs=[spec] * 7,
            out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)] * 7,
            interpret=interpret,
        )(pad(x), pad(y), pad(ap_x), pad(ap_y), pad(lam))
        o0, o1, o2, o3, tr, dx, dy = (o.reshape(-1)[:n] for o in outs)
        out4 = jnp.stack([o0, o1, o2, o3], -1)
        return out4, jnp.maximum(tr, 0.0), dx, dy

    return fn
