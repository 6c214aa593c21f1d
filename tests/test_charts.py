"""Cylinder pupil-chart dispatch (sphere / cyl-x / cyl-y).

The reference dispatches per lens on the generated
``lens_inner/outer_pupil_geometry`` string (src/lentil.h:387-389,
1418-1424); anamorphic prescriptions store their pupil rays on cylinder
charts.  These tests pin: (a) chart round-trips, (b) the element tracer's
chart output reproduces the raw 3D exit ray on every chart, (c) a fit on a
cylinder chart reaches sphere-chart-level fidelity and renders through the
forward camera.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu.lens.database import get_lens_rows
from pota_tpu.optics import geometry as geo
from pota_tpu.optics.fit import fit_lens, sample_fit_domain
from pota_tpu.optics.raytrace import (
    build_lens_system,
    trace_sensor_to_scene,
    trace_to_chart,
)

FLAGSHIP = "angenieux__double_gauss__1953__49mm"


@pytest.mark.parametrize("chart", ["sphere", "cyl-x", "cyl-y"])
def test_chart_roundtrip(chart):
    rng = np.random.default_rng(2)
    n = 256
    R = 60.0
    lim = 0.6 * R
    pos2 = jnp.asarray(rng.uniform(-lim, lim, (n, 2)), jnp.float32)
    dir2 = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 2)), jnp.float32)
    pos3, dir3 = geo.chart_to_cs(pos2, dir2, -R, R, chart)
    p2, d2 = geo.cs_to_chart(pos3, dir3, -R, R, chart)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pos2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(dir2),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("chart", ["sphere", "cyl-x", "cyl-y"])
def test_trace_to_chart_reproduces_exit_ray(chart):
    """chart_to_cs(trace_to_chart(...)) == the raw 3D exit ray."""
    rows = get_lens_rows(FLAGSHIP)
    lens = build_lens_system(rows, name=FLAGSHIP, outer_chart=chart)
    samples, _, _ = sample_fit_domain(lens, 2000, seed=11)
    lf = jnp.asarray(samples)
    res = trace_sensor_to_scene(lens, lf)
    out, trans, ap, valid = trace_to_chart(lens, lf)
    v = np.asarray(valid)
    assert v.sum() > 50

    R = lens.outer_pupil_curvature_radius
    pos, direction = geo.chart_to_cs(out[:, :2], out[:, 2:4], -R, R, chart)
    front_z = float(np.asarray(lens.vertex_z)[-1])
    pos = np.array(pos)
    pos[:, 2] += front_z

    d_ref = np.asarray(res["out_dir"])[v]
    d_chart = np.asarray(direction)[v]
    # same direction up to normalization
    cos = (d_ref * d_chart).sum(-1) / (
        np.linalg.norm(d_ref, axis=-1) * np.linalg.norm(d_chart, axis=-1)
    )
    assert cos.min() > 1.0 - 1e-6, cos.min()
    # same ray LINE: the chart position may sit elsewhere along the ray
    # (cylinder charts re-anchor onto the cylinder surface), so check the
    # original exit point's distance from the reconstructed line
    dn = d_chart / np.linalg.norm(d_chart, axis=-1, keepdims=True)
    delta = np.asarray(res["out_pos"])[v] - pos[v]
    perp = delta - (delta * dn).sum(-1, keepdims=True) * dn
    assert np.abs(perp).max() < 5e-3, np.abs(perp).max()


@pytest.mark.slow
def test_cylinder_fit_fidelity_and_forward_render():
    """A cyl-y outer-chart fit reaches sphere-level fidelity (it is just a
    different parametrization of the same rays) and drives the forward PO
    camera end to end."""
    from pota_tpu import CameraConfig, CameraType, RenderConfig
    from pota_tpu.optics.focus import setup_po_camera
    from pota_tpu.optics.polynomial import poly_eval
    from pota_tpu.render import scene as sc
    from pota_tpu.render.renderer import look_at, render_frame_simple

    rows = get_lens_rows(FLAGSHIP)
    lens = build_lens_system(rows, name="flagship_cyl", outer_chart="cyl-y")
    poly = fit_lens(lens, degree=3, n_samples=20_000)
    assert poly.outer_chart == "cyl-y"

    # held-out fidelity on the cylinder chart
    samples, _, _ = sample_fit_domain(lens, 1500, seed=987)
    out, trans, ap_xy, valid = (
        np.asarray(a) for a in trace_to_chart(lens, jnp.asarray(samples))
    )
    pred = np.asarray(poly_eval(poly.pt, jnp.asarray(samples)))
    rms_pos = float(
        np.sqrt(((pred[valid, :2] - out[valid, :2]) ** 2).mean())
    )
    assert rms_pos < 0.15, rms_pos  # deg-3 gate (tests/test_fit_fidelity.py)

    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model="flagship_cyl",
        fstop=2.8, focus_distance=150.0, vignetting_retries=1,
    )
    state = setup_po_camera(poly, cfg)
    rc = RenderConfig(xres=32, yres=32, spp=2, enable_redistribution=False)
    img = render_frame_simple(
        cfg, rc, sc.teapot_scene(), look_at([0, 0, 0], [0, 0, -1]),
        seed=0, po_lens=poly, po_state=state,
    )
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.01
