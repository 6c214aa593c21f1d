"""Ray differentials (jvp) + reverse ray — camera_create_ray parity.

The reference finite-differences 2 extra rays per camera ray
(src/lentil_camera.cpp:96-119, step=0.001) and approximates reverse_ray
with the pinhole FOV (src/lentil_camera.cpp:164-172).  Here the
differentials are exact jvps over the deriv-ray path; these tests pin them
against central finite differences of the same path.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu import CameraConfig, CameraType, RenderConfig
from pota_tpu.optics import thinlens
from pota_tpu.render import sampling
from pota_tpu.render.renderer import (
    camera_reverse_ray,
    trace_camera_rays_with_derivs,
)

RC = RenderConfig(xres=32, yres=32, spp=1)
CFG = CameraConfig(focal_length=50.0, fstop=2.8, focus_distance=120.0,
                   vignetting_retries=1)


def _fd_derivs(cfg, samples, step_frac=1e-3):
    """Central finite differences of the deriv-ray path, per pixel step."""
    sx, sy, r1, r2 = (samples[k] for k in ("sx", "sy", "r1", "r2"))
    hx = (2.0 / RC.xres) * step_frac
    hy = (2.0 / RC.yres) * step_frac

    def trace(sx_, sy_):
        o, d, _, _ = thinlens.trace_fw_thinlens(
            cfg, sx_, sy_, r1, r2, deriv_ray=True
        )
        return o, d

    ox1, dx1 = trace(sx + hx, sy)
    ox0, dx0 = trace(sx - hx, sy)
    oy1, dy1 = trace(sx, sy + hy)
    oy0, dy0 = trace(sx, sy - hy)
    return {
        "dOdx": (ox1 - ox0) / (2 * step_frac),
        "dDdx": (dx1 - dx0) / (2 * step_frac),
        "dOdy": (oy1 - oy0) / (2 * step_frac),
        "dDdy": (dy1 - dy0) / (2 * step_frac),
    }


def test_jvp_matches_finite_differences():
    samples = sampling.frame_samples(RC, seed=3)
    _, _, _, derivs = trace_camera_rays_with_derivs(CFG, RC, samples)
    fd = _fd_derivs(CFG, samples)
    for k in ("dOdx", "dOdy", "dDdx", "dDdy"):
        a, b = np.asarray(derivs[k]), np.asarray(fd[k])
        assert np.isfinite(a).all(), k
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-4, err_msg=k)


def test_direction_derivs_nonzero_and_origin_derivs_zero():
    """Thin-lens: the lens point doesn't depend on the screen position, so
    dO/dpixel == 0 while the direction sweeps across the frame."""
    samples = sampling.frame_samples(RC, seed=3)
    _, _, _, derivs = trace_camera_rays_with_derivs(CFG, RC, samples)
    assert float(jnp.abs(derivs["dOdx"]).max()) < 1e-6
    assert float(jnp.abs(derivs["dDdx"]).max()) > 1e-4
    assert float(jnp.abs(derivs["dDdy"]).max()) > 1e-4


def test_po_derivs_finite():
    from pota_tpu.optics.fit import load_poly_lens
    from pota_tpu.optics.focus import setup_po_camera

    name = "angenieux__double_gauss__1953__49mm"
    poly = load_poly_lens(name, degree=5)
    if poly is None:
        pytest.skip("flagship fit missing")
    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=name,
        fstop=2.8, focus_distance=150.0, vignetting_retries=1,
    )
    state = setup_po_camera(poly, cfg)
    samples = sampling.frame_samples(RC, seed=3)
    o, d, w, derivs = trace_camera_rays_with_derivs(
        cfg, RC, samples, po_lens=poly, po_state=state
    )
    live = np.asarray(w) > 0
    assert live.any()
    for k, v in derivs.items():
        assert np.isfinite(np.asarray(v)[live]).all(), k
    # directions change measurably across the frame
    assert float(np.abs(np.asarray(derivs["dDdx"])[live]).max()) > 1e-4


def test_reverse_ray_matches_projection():
    """reverse_ray(point on a forward ray's axis) lands near the source
    screen position for points near the image center (pinhole approx)."""
    p = jnp.asarray([[0.0, 0.0, -200.0], [10.0, -5.0, -100.0]])
    ps = camera_reverse_ray(CFG, p)
    tan_fov = CFG.thinlens_tan_fov
    expect = np.asarray(
        [[0.0, 0.0], [10.0 / (100.0 * tan_fov), -5.0 / (100.0 * tan_fov)]]
    )
    np.testing.assert_allclose(np.asarray(ps), expect, rtol=1e-6, atol=1e-7)
