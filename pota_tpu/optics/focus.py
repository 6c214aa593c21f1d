"""Focus solvers and f-stop calibration for the polynomial-optics camera.

TPU-native equivalents of the reference's setup-time machinery
(zpelgrims/pota ``src/lentil.h:1316-1563``): the ~20k-candidate logarithmic
sensor-shift search, the f-stop -> aperture-radius backward scan, and the
focus sanity check.  Every one of these is an embarrassingly parallel batch
of polynomial evaluations — the reference's serial loops become single
vmapped evaluations (SURVEY.md §7.4).

All run once per render setup; selection logic happens on host numpy.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import geometry as geo
from ..utils.profiling import log
from .polynomial import (
    PolyLens,
    inner_pupil_ok,
    lt_sample_aperture,
    pt_evaluate,
    pt_sample_aperture,
)

_BIG = 1e9


def logarithmic_shift_candidates(step: float = 1e-4) -> np.ndarray:
    """Sensor shifts swept by the reference's logarithmic_values
    (src/lens.h:395-407): sign(i) * i^2 * 45 mm for i in [-1, 1]."""
    i = np.arange(-1.0, 1.0 + step * 0.5, step)
    return np.sign(i) * i**2 * 45.0


@partial(jax.jit, static_argnames=("lam",))
def _axial_probe_distance(lens: PolyLens, shifts, lam: float):
    """Scene-side y=0 crossing distance of an axial probe ray per shift.

    Vectorized camera_get_y0_intersection_distance (ref src/lentil.h:1361-1386):
    probe through aperture point (0, housing*0.25), shift the sensor, evaluate,
    intersect the exit ray with the y=0 plane.
    """
    n = shifts.shape[0]
    sensor = jnp.zeros((n, 5)).at[:, 4].set(lam)
    ap_target = jnp.tile(
        jnp.asarray([0.0, lens.aperture_housing_radius * 0.25]), (n, 1)
    )
    sensor = pt_sample_aperture(lens, sensor, ap_target)
    shifted = sensor.at[:, 0].add(sensor[:, 2] * shifts).at[:, 1].add(
        sensor[:, 3] * shifts
    )
    out4, trans = pt_evaluate(lens, shifted)
    R = lens.outer_pupil_curvature_radius
    pos, direction = geo.chart_to_cs(out4[:, :2], out4[:, 2:4], -R, R,
                                     lens.outer_chart)
    hit = geo.line_plane_intersection_y0(pos, direction)
    ok = (
        (trans > 0.0)
        & (out4[:, 0] ** 2 + out4[:, 1] ** 2 <= lens.outer_pupil_radius**2)
        & inner_pupil_ok(lens, shifted)
    )
    return hit[:, 2], ok


def logarithmic_focus_search(lens: PolyLens, focus_distance_mm: float,
                             lam: float = 0.55) -> float:
    """Best sensor shift (mm) focusing at ``focus_distance_mm``.

    Vectorized version of ref src/lentil.h:1445-1460: among all candidate
    shifts, pick the one whose probe-ray crossing distance is closest below
    the target.
    """
    shifts = jnp.asarray(logarithmic_shift_candidates(), jnp.float32)
    dist, ok = _axial_probe_distance(lens, shifts, lam)
    dist = np.asarray(dist, np.float64)
    ok = np.asarray(ok)
    delta = focus_distance_mm - dist
    candidates = np.where(ok & (delta > 0.0), delta, np.inf)
    best = int(np.argmin(candidates))
    if not np.isfinite(candidates[best]):
        return 0.0
    return float(np.asarray(shifts)[best])


def focus_check(lens: PolyLens, sensor_shift: float, lam: float = 0.55):
    """Scene distance at which the shifted sensor actually focuses
    (ref trace_ray_focus_check, src/lentil.h:1316-1357)."""
    shifts = jnp.asarray([sensor_shift], jnp.float32)
    dist, ok = _axial_probe_distance(lens, shifts, lam)
    return float(dist[0]), bool(ok[0])


# sensor-shift hard limit shared with the reference's camera_set_focus
# clamp (src/lentil.h:1500-1516) and the logarithmic candidate sweep range
SENSOR_SHIFT_LIMIT_MM = 45.0


def camera_set_focus_infinity(lens: PolyLens, lam: float = 0.55) -> float:
    """Sensor shift focusing parallel (infinity) light, by backward tracing.

    TPU-native port of ``camera_set_focus_infinity`` (ref
    src/lentil.h:1524-1563): light-trace a parallel ray at height
    ``aperture_housing_radius * 0.1`` through the matching aperture point
    back to the sensor; the shift that refocuses it onto the axis is
    ``-sensor[k] / sensor[2+k]`` per component... the reference accumulates
    ``sensor[k]/sensor[2+k]`` (its sensor plane sits at the shift where the
    ray crosses x=y=0, signs folded into its conventions).  The reference's
    4-iteration loop re-traces the identical ray (aperture is reset every
    pass), so the average equals one evaluation — we trace once and average
    over the two components, masking non-positive direction components
    exactly like the reference's ``sensor(2+k) > 0`` guard.  NaN -> 0.0.
    """
    h = lens.aperture_housing_radius * 0.1
    target = jnp.asarray([[0.0, h, _BIG]], jnp.float32)
    ap = jnp.asarray([[0.0, h]], jnp.float32)
    sensor5, _, _ = lt_sample_aperture(lens, target, ap, lam)
    s = np.asarray(sensor5, np.float64)[0]
    offs, cnt = 0.0, 0
    for k in range(2):
        if s[2 + k] > 0.0:
            offs += s[k] / s[2 + k]
            cnt += 1
    if cnt == 0:
        return 0.0
    offset = offs / cnt
    return float(offset) if np.isfinite(offset) else 0.0


def focus_infinity_shift(lens: PolyLens, lam: float = 0.55) -> float:
    """Infinity-focus sensor shift via the logarithmic forward search (the
    reference's second infinity estimate, src/lentil.h:1621-1624)."""
    return logarithmic_focus_search(lens, 999999999.0, lam)


@partial(jax.jit, static_argnames=("lam",))
def _fstop_scan(lens_l: PolyLens, h, lam: float):
    """Batched marginal-ray f-number per parallel-ray height (jitted at
    module level so repeated camera setups reuse one compilation)."""
    target = jnp.stack(
        [jnp.zeros_like(h), h, jnp.full_like(h, _BIG)], -1
    )
    ap = jnp.stack([jnp.full_like(h, 0.01), h], -1)
    sensor5, out4, trans = lt_sample_aperture(lens_l, target, ap, lam)
    ok = (trans > 0.0) & inner_pupil_ok(lens_l, sensor5)
    Ri = lens_l.inner_pupil_curvature_radius
    pos, direction = geo.chart_to_cs(
        out4[:, :2], out4[:, 2:4], -Ri + lens_l.back_focal_length, Ri,
        lens_l.inner_chart,
    )
    theta = jnp.arctan(pos[:, 1] / pos[:, 2])
    return 1.0 / (jnp.sin(theta) * 2.0), ok


def calibrate_fstop(lens: PolyLens, fstop_target: float, lam: float = 0.55,
                    n_rays: int = 1000):
    """F-stop -> aperture radius calibration scan.

    Vectorized trace_backwards_for_fstop (ref src/lentil.h:1390-1441): march
    parallel-ray heights up the outer pupil, light-trace each to the sensor,
    measure the marginal-ray angle at the inner pupil, convert to
    f = 1/(2 sin theta), and return the largest height whose f-number still
    exceeds the target.
    """
    heights = np.arange(1, n_rays) / n_rays * lens.outer_pupil_radius
    fstop, ok = _fstop_scan(lens, jnp.asarray(heights, jnp.float32), lam)

    fstop = np.asarray(fstop, np.float64)
    ok = np.asarray(ok)
    best_f, best_r = 0.0, 0.0
    for i in range(len(heights)):
        if not ok[i]:
            continue
        if fstop[i] < fstop_target:
            break
        best_f, best_r = float(fstop[i]), float(heights[i])
    return best_f, best_r


import dataclasses


@dataclasses.dataclass(frozen=True)
class POState:
    """Derived per-render camera state (static python floats, hashable so it
    can be a jit static argument and be baked into the Pallas kernels)."""

    aperture_radius: float
    sensor_shift: float
    focus_distance: float
    tan_fov: float


def setup_po_camera(lens: PolyLens, cfg, scene=None) -> "POState":
    """Replicate camera_model_specific_setup for PO (ref src/lentil.h:1568-1661).

    Returns the derived state the per-ray tracer needs: focus distance is
    pre-multiplied x10 (the reference's unit quirk, Appendix B of SURVEY.md),
    the aperture radius comes from the f-stop calibration, the sensor shift
    from the logarithmic focus search.  Pass the render ``scene`` to also
    prebuild the fused backward splat kernel (its sphere count is baked).
    """
    lam = cfg.lambda_um
    focus_distance = cfg.focus_distance * 10.0
    if cfg.fstop == 0.0:
        aperture_radius = lens.aperture_radius_at_fstop
    else:
        _, calibrated_r = calibrate_fstop(lens, cfg.effective_fstop, lam)
        aperture_radius = min(lens.aperture_radius_at_fstop, calibrated_r)
        if aperture_radius <= 0.0:
            aperture_radius = lens.aperture_radius_at_fstop
    # ONE probe sweep over all candidate shifts serves the focus solve, the
    # infinity estimate AND the sanity check (the reference re-traces for
    # each, src/lentil.h:1445-1460 + 1621-1648; here the sweep is a single
    # already-jitted batch so setup costs one compile, not three)
    shifts_np = logarithmic_shift_candidates()
    dist_j, ok_j = _axial_probe_distance(
        lens, jnp.asarray(shifts_np, jnp.float32), lam
    )
    dist_np = np.asarray(dist_j, np.float64)
    ok_np = np.asarray(ok_j)

    def pick(target):
        delta = target - dist_np
        cand = np.where(ok_np & (delta > 0.0), delta, np.inf)
        i = int(np.argmin(cand))
        return 0.0 if not np.isfinite(cand[i]) else float(shifts_np[i])

    sensor_shift = pick(focus_distance) + cfg.extra_sensor_shift
    # hard shift limit, ref camera_set_focus clamp (src/lentil.h:1500-1516)
    if abs(sensor_shift) > SENSOR_SHIFT_LIMIT_MM:
        log("CAMERA PO",
            f"sensor shift {sensor_shift:.3f} mm exceeds limit "
            f"+-{SENSOR_SHIFT_LIMIT_MM} mm; clamping")
        sensor_shift = float(np.clip(sensor_shift, -SENSOR_SHIFT_LIMIT_MM,
                                     SENSOR_SHIFT_LIMIT_MM))
    # setup-time focus sanity checks (ref src/lentil.h:1617-1656): report
    # both infinity estimates and verify the solved shift actually focuses
    # where asked
    shift_inf_log = pick(999999999.0)
    shift_inf_lt = camera_set_focus_infinity(lens, lam)
    log("CAMERA PO",
        f"{lens.name}: sensor_shift {sensor_shift:.4f} mm "
        f"(infinity: log-search {shift_inf_log:.4f} mm, "
        f"parallel light-trace {shift_inf_lt:.4f} mm)", once=True)
    # nearest-candidate lookup in the sweep (a fresh 1-ray probe would cost
    # its own compile; the 1e-4-step sweep is dense enough for a sanity gate)
    j = int(np.argmin(np.abs(shifts_np - sensor_shift)))
    test_dist, focus_ok = float(dist_np[j]), bool(ok_np[j])
    if not focus_ok:
        log("CAMERA PO",
            f"{lens.name}: focus check FAILED at shift "
            f"{sensor_shift:.4f} mm — the lens system may be incorrect or "
            "the sensor placed at a wrong distance "
            "(ref src/lentil.h:1649-1655)")
    elif focus_distance > 0.0:
        rel_err = abs(test_dist - focus_distance) / focus_distance
        if rel_err > 0.05 and focus_distance < 1e6:
            log("CAMERA PO",
                f"{lens.name}: focus test ray crosses at {test_dist:.1f} mm "
                f"vs requested {focus_distance:.1f} mm "
                f"({rel_err * 100.0:.1f}% off)")
    state = POState(
        aperture_radius=float(aperture_radius),
        sensor_shift=float(sensor_shift),
        focus_distance=float(focus_distance),
        tan_fov=float(np.tan(lens.fov / 2.0)),
    )
    # eagerly bake+cache the fused forward/backward kernels for jitted renders
    from ..models.po_camera import prebuild_forward_kernel
    from ..ops.po_pallas import prebuild_backward_kernel, prebuild_splat_kernel

    prebuild_forward_kernel(lens, state.sensor_shift)
    prebuild_backward_kernel(lens, cfg.lt_newton_iterations)
    if scene is not None and hasattr(scene, "n_objects"):
        prebuild_splat_kernel(lens, cfg.lt_newton_iterations,
                              scene.n_objects)
    return state
