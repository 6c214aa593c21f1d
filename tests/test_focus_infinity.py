"""Focus-at-infinity solvers + setup-time sanity checks.

Ports the reference's infinity machinery (zpelgrims/pota
src/lentil.h:1524-1563 camera_set_focus_infinity, :1617-1656 setup-time
checks): the parallel-light backward shift, the logarithmic forward-search
infinity shift, their mutual agreement, and the warning paths.
"""
import numpy as np
import pytest

from pota_tpu import CameraConfig, CameraType
from pota_tpu.optics.fit import get_or_fit_lens
from pota_tpu.optics.focus import (
    SENSOR_SHIFT_LIMIT_MM,
    camera_set_focus_infinity,
    focus_check,
    focus_infinity_shift,
    logarithmic_focus_search,
    setup_po_camera,
)

FLAGSHIP = "angenieux__double_gauss__1953__49mm"


@pytest.fixture(scope="module")
def lens():
    return get_or_fit_lens(FLAGSHIP)


def test_infinity_shift_estimates_agree(lens):
    """The parallel-light-trace and logarithmic-search infinity shifts are
    independent derivations of the same quantity (the reference logs both
    side by side, src/lentil.h:1621-1630); they must agree to ~lens scale."""
    s_lt = camera_set_focus_infinity(lens)
    s_log = focus_infinity_shift(lens)
    assert np.isfinite(s_lt) and np.isfinite(s_log)
    # both are small corrections for a 49mm lens focused at infinity
    assert abs(s_lt) < 5.0 and abs(s_log) < 5.0
    assert abs(s_lt - s_log) < 0.5, (s_lt, s_log)


def test_far_target_approaches_infinity_shift(lens):
    """Focusing at an ever-farther target converges to the infinity shift."""
    s_inf = focus_infinity_shift(lens)
    s_far = logarithmic_focus_search(lens, 1e7)
    s_near = logarithmic_focus_search(lens, 1000.0)  # 1 m
    assert abs(s_far - s_inf) < abs(s_near - s_inf)
    assert abs(s_far - s_inf) < 0.05, (s_far, s_inf)


def test_focus_check_validates_solved_shift(lens):
    """The y=0 probe at the solved shift must cross near the target
    (the reference's setup-time focus test, src/lentil.h:1643-1648)."""
    target = 2000.0  # mm
    shift = logarithmic_focus_search(lens, target)
    dist, ok = focus_check(lens, shift)
    assert ok
    assert abs(dist - target) / target < 0.05, (dist, target)


def test_setup_po_camera_runs_checks_and_logs(lens, capfd):
    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
        fstop=2.8, focus_distance=200.0,
    )
    state = setup_po_camera(lens, cfg)
    assert abs(state.sensor_shift) <= SENSOR_SHIFT_LIMIT_MM
    err = capfd.readouterr().err
    assert "infinity" in err  # the infinity diagnostics were reported


def test_setup_clamps_extreme_extra_shift(lens, capfd):
    """A user extra_sensor_shift past the hard limit is clamped with a
    warning (the reference's camera_set_focus +-45 mm clamp,
    src/lentil.h:1500-1516)."""
    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
        fstop=2.8, focus_distance=200.0, extra_sensor_shift=100.0,
    )
    state = setup_po_camera(lens, cfg)
    assert state.sensor_shift == SENSOR_SHIFT_LIMIT_MM
    assert "clamping" in capfd.readouterr().err
