"""Element-tracer correctness: paraxial oracles + optical invariants."""
import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu.lens.database import BASE_DESIGNS, CATALOG, get_lens_rows
from pota_tpu.optics.raytrace import (
    _paraxial_bfl_efl,
    build_lens_system,
    trace_sensor_to_scene,
)

SINGLET = [
    [50.0, 5.0, 1.5, 60.0, 20.0],
    [-50.0, 2.0, 1.0, 0.0, 20.0],
    [0.0, 0.0, 1.0, 0.0, 18.0],  # aperture
]


def test_singlet_efl_matches_thick_lens_formula():
    _, efl = _paraxial_bfl_efl(np.asarray(SINGLET))
    # 1/f = (n-1) [1/R1 - 1/R2 + (n-1) d / (n R1 R2)]
    n, d, r1, r2 = 1.5, 5.0, 50.0, -50.0
    inv_f = (n - 1) * (1 / r1 - 1 / r2 + (n - 1) * d / (n * r1 * r2))
    np.testing.assert_allclose(efl, 1.0 / inv_f, rtol=1e-10)


def test_singlet_real_rays_match_paraxial():
    lens = build_lens_system(np.asarray(SINGLET), name="singlet")
    lf = jnp.asarray(
        [[0, 0, 1e-3, 0, 0.55], [1.0, 0, 0, 0, 0.55]], jnp.float32
    )
    res = trace_sensor_to_scene(lens, lf)
    assert bool(res["valid"].all())
    d = np.asarray(res["out_dir"])
    # axial focal-point ray exits collimated
    assert abs(d[0, 0] / d[0, 2]) < 1e-4
    # 1mm-off-axis ray exits at slope ~ -1/efl
    np.testing.assert_allclose(
        d[1, 0] / d[1, 2], -1.0 / lens.efl, rtol=0.02
    )


def test_all_base_designs_build_and_collimate():
    for name, rows in BASE_DESIGNS.items():
        lens = build_lens_system(np.asarray(rows), name=name)
        assert lens.back_focal_length > 0, name
        assert lens.efl > 0, name
        ang = np.linspace(-0.03, 0.03, 4)
        dx, dy = np.meshgrid(ang, ang)
        lf = np.stack(
            [np.zeros(16), np.zeros(16), dx.ravel(), dy.ravel(),
             np.full(16, 0.55)], -1,
        ).astype(np.float32)
        res = trace_sensor_to_scene(lens, jnp.asarray(lf))
        v = np.asarray(res["valid"])
        assert v.sum() >= 12, name
        d = np.asarray(res["out_dir"])[v]
        md = d.mean(0) / np.linalg.norm(d.mean(0))
        spread = np.degrees(np.arccos(np.clip(d @ md, -1, 1))).max()
        assert spread < 0.6, (name, spread)


def test_catalog_complete_and_scaled():
    assert len(CATALOG) == 45  # 44 reference names + the anamorphic extension
    rows = get_lens_rows("zeiss__biotar__1927__58mm")
    _, efl = _paraxial_bfl_efl(rows)
    np.testing.assert_allclose(efl, 58.0, rtol=1e-6)


def test_dispersion_blue_bends_more():
    lens = build_lens_system(np.asarray(SINGLET), name="singlet")
    lf = jnp.asarray(
        [[5.0, 0, 0, 0, 0.45], [5.0, 0, 0, 0, 0.65]], jnp.float32
    )
    res = trace_sensor_to_scene(lens, lf)
    d = np.asarray(res["out_dir"])
    # blue (0.45um) refracts more strongly -> steeper exit slope
    assert abs(d[0, 0] / d[0, 2]) > abs(d[1, 0] / d[1, 2])
