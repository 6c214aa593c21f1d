"""Bidirectional redistribution: energy conservation, determinism, spread."""
import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu import CameraConfig, RenderConfig
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_frame

CFG = CameraConfig(
    focal_length=65.0, fstop=1.8, focus_distance=150.0,
    vignetting_retries=2, max_bidir_samples=16,
)
RC = RenderConfig(xres=48, yres=48, spp=4)
M = look_at([0, 0, 0], [0, 0, -1])


@pytest.fixture(scope="module")
def grid_scene():
    return sc.lightgrid_scene(n=3, spacing=30.0, z=-400.0, radius=3.0,
                              intensity=40.0)


def test_redistribution_spreads_highlights():
    """A strongly defocused emitter's bokeh disc lights far more pixels
    with redistribution than the passthrough filter's 1.5-wide footprint
    halo can (close focus: disc ~14 px on the 48 px frame)."""
    cfg = CameraConfig(focal_length=65.0, fstop=1.8, focus_distance=15.0,
                       vignetting_retries=2, max_bidir_samples=64,
                       splat_queue_mult=6)
    scene = sc.lightgrid_scene(n=1, spacing=1.0, z=-45.0, radius=1.0,
                               intensity=40.0)
    img, fb = render_frame(cfg, RC, scene, M, seed=0)
    rc_no = RenderConfig(xres=48, yres=48, spp=4, enable_redistribution=False)
    img_no, _ = render_frame(cfg, rc_no, scene, M, seed=0)
    img, img_no = np.asarray(img), np.asarray(img_no)
    assert np.isfinite(img).all()
    lit = (img[..., :3].max(-1) > 0.02).sum()
    lit_no = (img_no[..., :3].max(-1) > 0.02).sum()
    assert lit > lit_no * 1.5, (lit, lit_no)


def test_energy_approximately_conserved(grid_scene):
    img, fb = render_frame(CFG, RC, grid_scene, M, seed=0)
    rc_no = RenderConfig(xres=48, yres=48, spp=4, enable_redistribution=False)
    img_no, _ = render_frame(CFG, rc_no, grid_scene, M, seed=0)
    e = float(np.asarray(img)[..., :3].sum())
    e_no = float(np.asarray(img_no)[..., :3].sum())
    assert 0.7 * e_no < e < 1.4 * e_no, (e, e_no)


def test_deterministic(grid_scene):
    a, _ = render_frame(CFG, RC, grid_scene, M, seed=0)
    b, _ = render_frame(CFG, RC, grid_scene, M, seed=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_debug_aov_counts_only_redistributed(grid_scene):
    img, fb = render_frame(CFG, RC, grid_scene, M, seed=0)
    dbg = np.asarray(fb["lentil_debug"])[..., 0]
    assert dbg.max() > 0  # bright out-of-focus pixels got budgets
    # in-focus/dark majority has zero budget
    assert (dbg == 0).mean() > 0.5


def test_occlusion_blocks_splats():
    """A wall between the highlight and the lens kills its redistribution."""
    base = sc.lightgrid_scene(n=1, spacing=1.0, z=-400.0, radius=3.0,
                              intensity=40.0)
    # add a big blocking sphere just in front of the emitter
    blocked = sc.SphereScene(
        centers=jnp.concatenate(
            [base.centers, jnp.asarray([[0.0, 0.0, -380.0]])], 0
        ),
        radii=jnp.concatenate([base.radii, jnp.asarray([12.0])], 0),
        emission=jnp.concatenate(
            [base.emission, jnp.zeros((1, 3))], 0
        ),
        albedo=jnp.concatenate([base.albedo, jnp.zeros((1, 3))], 0),
        sky_color=base.sky_color,
        light_dir=base.light_dir,
        light_color=base.light_color,
    )
    img_b, fb_b = render_frame(CFG, RC, blocked, M, seed=0)
    # emitter is hidden: no energy from it at all
    assert float(np.asarray(img_b)[..., :3].sum()) < 1e-3
