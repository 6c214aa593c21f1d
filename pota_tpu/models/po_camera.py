"""Polynomial-optics forward camera (the flagship model).

TPU-native re-derivation of the reference's trace_ray_fw_po
(zpelgrims/pota ``src/lentil.h:283-427``): the vignetting-retry while-loop
becomes a fixed-K batch of candidate aperture samples evaluated in parallel
with a first-success select; the generated per-lens polynomial dispatch
becomes data-driven sparse-poly evaluation (:mod:`pota_tpu.optics.polynomial`).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import CameraConfig
from ..optics import geometry as geo
from ..optics import samplers
from ..optics.polynomial import (
    PolyLens,
    inner_pupil_ok,
    pt_evaluate,
    pt_sample_aperture,
)
from ..utils import rng as prng

_FORWARD_KERNEL_CACHE: dict = {}
# (name, shift, iterations) -> (digest, kernel): the prebuilt kernel looked
# up by static name when the coefficients are tracers (see resolver note)
_FORWARD_KERNEL_BY_NAME: dict = {}


def _kernel_key(lens: PolyLens, sensor_shift: float, iterations: int):
    # digest of the concrete fit (degree + coefficients) so a refit or a
    # different-degree fit of a same-named lens never hits a stale kernel
    from ..ops.po_pallas import lens_digest

    digest = lens_digest(lens)
    if digest is None:
        return None
    return (lens.name, digest, round(float(sensor_shift), 6), iterations)


def _resolve_forward_kernel(lens: PolyLens, sensor_shift: float,
                            iterations: int, use_pallas: bool):
    """Return the fused per-lens kernel, or None for the pure-JAX path.

    The kernel bakes the *concrete* coefficients, so it can only be built
    outside tracing; :func:`prebuild_forward_kernel` (called by
    setup_po_camera) populates the cache so jitted renders find it by the
    static lens name.  Training paths must pass ``use_pallas=False`` —
    gradients w.r.t. coefficients require the pure path.
    """
    import os

    import jax
    import jax.core

    if not use_pallas or os.environ.get("POTA_DISABLE_PALLAS"):
        return None
    if jax.default_backend() == "cpu":
        return None
    name_key = (lens.name, round(float(sensor_shift), 6), iterations)
    if isinstance(lens.pt.coeffs, jax.core.Tracer):
        # Inside jit the lens pytree's coefficients are tracers, so the
        # digest can't be computed — look up the kernel PREBUILT by
        # setup_po_camera under the static lens name.  Render contract:
        # jitted renders use the concrete committed fit (prebuild refreshes
        # the entry on every setup); training paths that perturb
        # coefficients MUST pass use_pallas=False (they need the
        # differentiable pure path anyway).  Without this fallback every
        # jitted render silently pays the pure path — at 1080p that is a
        # [2M, K, T] monomial temp (~5 GB) per evaluation.
        ent = _FORWARD_KERNEL_BY_NAME.get(name_key)
        return ent[1] if ent is not None else None
    key = _kernel_key(lens, sensor_shift, iterations)
    if key is None:
        return None
    kern = _FORWARD_KERNEL_CACHE.get(key)
    if kern is None:
        from ..ops.po_pallas import build_po_forward_kernel

        kern = build_po_forward_kernel(
            lens, float(sensor_shift), newton_iterations=iterations
        )
        _FORWARD_KERNEL_CACHE[key] = kern
    _FORWARD_KERNEL_BY_NAME[name_key] = (key[1], kern)
    return kern


def prebuild_forward_kernel(lens: PolyLens, sensor_shift: float,
                            iterations: int = 3):
    """Eagerly build + cache the fused kernel (call with concrete coeffs)."""
    import jax

    if jax.default_backend() == "cpu":
        return
    _resolve_forward_kernel(lens, sensor_shift, iterations, True)


def po_sample_aperture_disk(cfg: CameraConfig, r1, r2, bokeh_cdf=None):
    """PO-path aperture sampler: image-bokeh / plain concentric / blades.

    Mirrors ref src/lentil.h:312-324 — note the PO path uses the *plain*
    concentric disk (no spherical-abb bias / squircle; those are thin-lens
    empirical controls).
    """
    if cfg.bokeh_enable_image and bokeh_cdf is not None:
        from ..render.bokeh_image import bokeh_sample
        return bokeh_sample(bokeh_cdf, r1, r2)
    if cfg.aperture_blades < 2:
        return samplers.concentric_disk_sample(r1, r2)
    return samplers.triangular_aperture_sample(r1, r2, 1.0, cfg.aperture_blades)


def trace_fw_po(
    cfg: CameraConfig,
    lens: PolyLens,
    sx,
    sy,
    r1,
    r2,
    retry_key=None,
    deriv_ray: bool = False,
    bokeh_cdf=None,
    po_state=None,
    newton_iterations: int = 3,
    use_pallas: bool = True,
):
    """Forward PO trace, batched over rays [N].

    ``po_state`` is the setup dict from
    :func:`pota_tpu.optics.focus.setup_po_camera` (aperture_radius mm,
    sensor_shift mm).  Returns (origin [N,3], dir [N,3], weight [N],
    tries [N]) scaled to scene units, camera looking down -z.
    """
    if po_state is None:
        from ..optics.focus import setup_po_camera
        po_state = setup_po_camera(lens, cfg)
    aperture_radius = po_state.aperture_radius
    sensor_shift = po_state.sensor_shift

    n_tries = 1 if deriv_ray else cfg.vignetting_retries + 1
    n = sx.shape[0]

    # sensor light field (identical across retries)
    sensor_xy = jnp.stack(
        [sx * (cfg.sensor_width * 0.5), sy * (cfg.sensor_width * 0.5)], -1
    )
    lam = jnp.full((n,), cfg.lambda_um, sensor_xy.dtype)

    # K candidate aperture samples
    if cfg.enable_dof:
        if n_tries > 1:
            tries_idx = jnp.arange(1, n_tries, dtype=jnp.uint32)
            us = prng.uniforms(retry_key[:, None], tries_idx[None, :], 2)
            r1k = jnp.concatenate([r1[:, None], us[..., 0]], axis=1)
            r2k = jnp.concatenate([r2[:, None], us[..., 1]], axis=1)
        else:
            r1k, r2k = r1[:, None], r2[:, None]
        unit_disk = po_sample_aperture_disk(cfg, r1k, r2k, bokeh_cdf)
        aperture = unit_disk * aperture_radius  # [N, K, 2]
    else:
        aperture = jnp.zeros((n, n_tries, 2), sensor_xy.dtype)

    sensor5 = jnp.concatenate(
        [
            jnp.broadcast_to(sensor_xy[:, None, :], (n, n_tries, 2)),
            jnp.zeros((n, n_tries, 2), sensor_xy.dtype),
            jnp.broadcast_to(lam[:, None, None], (n, n_tries, 1)),
        ],
        -1,
    )  # [N, K, 5]

    kern = (
        _resolve_forward_kernel(lens, sensor_shift, newton_iterations,
                                use_pallas)
        if cfg.enable_dof else None
    )
    if kern is not None:
        # fused per-lens kernel: Newton aperture solve + shift + pt_evaluate
        # (61x faster than the pure-JAX path on TPU; see ops/po_pallas.py)
        flat = lambda a: a.reshape(-1)
        out4_f, trans_f, dx_f, dy_f = kern(
            flat(sensor5[..., 0]), flat(sensor5[..., 1]),
            flat(aperture[..., 0]), flat(aperture[..., 1]),
            flat(sensor5[..., 4]),
        )
        out4 = out4_f.reshape(n, n_tries, 4)
        trans = trans_f.reshape(n, n_tries)
        shifted_x = sensor5[..., 0] + dx_f.reshape(n, n_tries) * sensor_shift
        shifted_y = sensor5[..., 1] + dy_f.reshape(n, n_tries) * sensor_shift
        shifted = jnp.stack(
            [shifted_x, shifted_y, dx_f.reshape(n, n_tries),
             dy_f.reshape(n, n_tries), sensor5[..., 4]], -1,
        )
    else:
        if cfg.enable_dof:
            sensor5 = pt_sample_aperture(
                lens, sensor5, aperture, iterations=newton_iterations
            )

        # move to the polynomial's sensor plane (ref src/lentil.h:349-350)
        shifted = sensor5.at[..., 0].add(sensor5[..., 2] * sensor_shift)
        shifted = shifted.at[..., 1].add(shifted[..., 3] * sensor_shift)

        out4, trans = pt_evaluate(lens, shifted)

    ok = trans > 0.0
    ok &= (
        out4[..., 0] ** 2 + out4[..., 1] ** 2
        <= lens.outer_pupil_radius**2
    )
    ok &= inner_pupil_ok(lens, shifted)

    # first-success select over the K candidates
    first = jnp.argmax(ok, axis=-1)
    any_ok = jnp.any(ok, axis=-1)
    take = lambda a: jnp.take_along_axis(a, first[:, None, None], axis=1).squeeze(1)
    out_sel = take(out4)

    R = lens.outer_pupil_curvature_radius
    origin, direction = geo.chart_to_cs(
        out_sel[..., :2], out_sel[..., 2:4], -R, R, lens.outer_chart
    )

    scale = cfg.unit_scale_po  # negative: reverses rays + converts mm->units
    origin = origin * scale
    direction = direction * scale
    dir_n2 = jnp.sum(direction * direction, -1, keepdims=True)
    direction = direction / jnp.sqrt(jnp.maximum(dir_n2, 1e-24))

    finite = jnp.all(jnp.isfinite(origin) & jnp.isfinite(direction), -1)
    weight = jnp.where(any_ok & finite, 1.0, 0.0)
    tries = jnp.where(any_ok, first, n_tries).astype(jnp.int32)
    return origin, direction, weight, tries
