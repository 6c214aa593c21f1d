"""AOV framework: tokenizer, spec plumbing, resolved planes."""
import numpy as np
import pytest

from pota_tpu import CameraConfig, RenderConfig
from pota_tpu.render import scene as sc
from pota_tpu.render.aov import (
    DEFAULT_AOVS,
    TokenizedOutput,
    specs_from_output_strings,
)
from pota_tpu.render.renderer import look_at, render_frame
from pota_tpu.render.splat import resolve_aovs


def test_tokenizer_roundtrip():
    s = "RGBA RGBA gaussian_filter exr_driver"
    to = TokenizedOutput.parse(s)
    assert to.aov_name_tok == "RGBA" and to.filter_tok == "gaussian_filter"
    assert to.rebuild() == s

    s2 = "persp_cam Z FLOAT closest_filter exr_driver HALF"
    to2 = TokenizedOutput.parse(s2)
    assert to2.camera_tok == "persp_cam" and to2.half_flag
    assert to2.rebuild() == s2


def test_specs_from_outputs_replaces_filter_and_dedups():
    specs = specs_from_output_strings([
        "RGBA RGBA gaussian_filter d",
        "Z FLOAT closest_filter d",
        "RGBA RGBA gaussian_filter d2",  # duplicate name -> dropped
    ])
    assert [s.name for s in specs] == ["RGBA", "Z"]
    assert specs[0].filter == "gaussian"
    assert specs[1].filter == "closest"


@pytest.fixture(scope="module")
def fb():
    cfg = CameraConfig(focal_length=65.0, fstop=1.8, focus_distance=150.0,
                       vignetting_retries=1, max_bidir_samples=8)
    rc = RenderConfig(xres=32, yres=32, spp=2)
    scene = sc.teapot_scene()
    img, fb = render_frame(cfg, rc, scene, look_at([0, 0, 0], [0, 0, -1]),
                           seed=0)
    return rc, fb


def test_all_default_aovs_present(fb):
    rc, buffers = fb
    for spec in DEFAULT_AOVS:
        assert spec.name in buffers, spec.name
        assert buffers[spec.name].shape == (rc.yres, rc.xres, 4)


def test_z_aov_sane(fb):
    rc, buffers = fb
    resolved = resolve_aovs(rc, buffers)
    z = np.asarray(resolved["Z"])[..., 0]
    hit = (z > 0) & (z < 1e29)
    assert hit.any()
    # teapot spheres sit between 100 and 400 units from camera
    assert 80.0 < z[hit].min() < 400.0
    assert z[hit].max() < 500.0


def test_p_aov_matches_depth(fb):
    rc, buffers = fb
    resolved = resolve_aovs(rc, buffers)
    z = np.asarray(resolved["Z"])[..., 0]
    p = np.asarray(resolved["P"])[..., :3]
    hit = (z > 0) & (z < 1e29)
    # |P| (world, camera at origin) approximately equals Z (ray distance)
    np.testing.assert_allclose(
        np.linalg.norm(p[hit], axis=-1), z[hit], rtol=0.05
    )


def test_raydir_aov_unit_norm(fb):
    rc, buffers = fb
    resolved = resolve_aovs(rc, buffers)
    rd = np.asarray(resolved["lentil_raydir"])[..., :3]
    z = np.asarray(resolved["Z"])[..., 0]
    hit = (z > 0) & (z < 1e29)
    np.testing.assert_allclose(
        np.linalg.norm(rd[hit], axis=-1), 1.0, atol=1e-4
    )


def test_opacity_weighted_crypto_layers():
    """A 50%-transparent glass sphere in front of an opaque one must split
    its pixel coverage by opacity (front gets 1-grey(tint), remainder to
    the hit behind) — the reference's depth-iterated opacity-weighted
    cache, src/lentil.h:780-811."""
    import jax.numpy as jnp

    from pota_tpu.render.splat import resolve_crypto

    glass_tint = 0.5
    scene = sc.SphereScene(
        centers=jnp.asarray([[0.0, 0.0, -100.0], [0.0, 0.0, -300.0]]),
        radii=jnp.asarray([40.0, 60.0]),
        emission=jnp.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]]),
        albedo=jnp.zeros((2, 3)),
        sky_color=jnp.zeros((3,)),
        light_dir=jnp.asarray([0.0, 1.0, 0.0]),
        light_color=jnp.zeros((3,)),
        transmission=jnp.asarray(
            [[glass_tint] * 3, [0.0, 0.0, 0.0]]
        ),
    )
    cfg = CameraConfig(focal_length=65.0, fstop=1.8, focus_distance=150.0,
                       vignetting_retries=1, max_bidir_samples=8)
    rc = RenderConfig(xres=16, yres=16, spp=4, enable_id_matte=True)
    img, buffers = render_frame(cfg, rc, scene,
                                look_at([0, 0, 0], [0, 0, -1]), seed=0)
    rank_id = np.asarray(buffers["crypto_rank_id"])  # [H, W, K]
    rank_w = np.asarray(buffers["crypto_rank_w"])
    total = np.asarray(buffers["crypto_total"])
    # central pixels: glass covers the opaque sphere entirely; collect each
    # id's coverage from the ranked pairs
    cov = np.zeros((16, 16, 2))
    for i in range(2):
        m = rank_id == i
        cov[..., i] = (rank_w * m).sum(-1) / np.maximum(total, 1e-12)
    c = cov[6:10, 6:10]
    # front (id 0) gets opacity 1-0.5; behind (id 1) the remaining quota
    np.testing.assert_allclose(c[..., 0], 1.0 - glass_tint, atol=0.02)
    np.testing.assert_allclose(c[..., 1], glass_tint, atol=0.02)


def test_id_matte_ranked_resolve():
    from pota_tpu.render.splat import resolve_crypto

    cfg = CameraConfig(focal_length=65.0, fstop=1.8, focus_distance=150.0,
                       vignetting_retries=1, max_bidir_samples=8)
    rc = RenderConfig(xres=32, yres=32, spp=2, enable_id_matte=True)
    scene = sc.teapot_scene()
    img, buffers = render_frame(cfg, rc, scene,
                                look_at([0, 0, 0], [0, 0, -1]), seed=0)
    assert "crypto_rank_id" in buffers
    layers = resolve_crypto(buffers, ranks=3)
    assert len(layers) == 3
    l0 = np.asarray(layers[0])
    # rank-0 coverage in [0, 1]; covered pixels exist
    assert (l0[..., 1] <= 1.0 + 1e-5).all()
    assert (l0[..., 1] > 0.5).any()
    # id channel holds integer object indices within range
    ids = l0[..., 0][l0[..., 1] > 0]
    assert ids.min() >= 0 and ids.max() < scene.n_objects
    # rank-0 weight >= rank-1 weight everywhere
    l1 = np.asarray(layers[0][..., 3])
    assert (l0[..., 1] + 1e-6 >= l1).all()
