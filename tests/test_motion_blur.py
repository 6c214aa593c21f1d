"""Camera motion blur: per-sample shutter time + matrix interpolation."""
import numpy as np
import jax.numpy as jnp

from pota_tpu import CameraConfig, RenderConfig
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_frame

CFG = CameraConfig(focal_length=65.0, fstop=4.0, focus_distance=400.0,
                   vignetting_retries=1, max_bidir_samples=4)
RC = RenderConfig(xres=48, yres=48, spp=4)


def _render(cam_end=None):
    scene = sc.lightgrid_scene(n=1, spacing=1.0, z=-400.0, radius=4.0,
                               intensity=30.0)
    m0 = look_at([0, 0, 0], [0, 0, -1])
    img, _ = render_frame(CFG, RC, scene, m0, seed=0,
                          cam_to_world_end=cam_end)
    return np.asarray(img)


def test_static_end_matrix_matches_no_motion():
    m0 = look_at([0, 0, 0], [0, 0, -1])
    a = _render(cam_end=None)
    b = _render(cam_end=m0)
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_camera_pan_smears_highlight():
    a = _render(cam_end=None)
    m1 = look_at([30.0, 0, 0], [30.0, 0, -400.0])
    b = _render(cam_end=m1)
    lit = lambda im: (im[..., :3].max(-1) > 0.05)
    # the moving camera smears the emitter across more columns
    cols_a = np.unique(np.where(lit(a))[1])
    cols_b = np.unique(np.where(lit(b))[1])
    assert len(cols_b) > len(cols_a) + 2, (len(cols_a), len(cols_b))
    # time AOV rides the stream: same total energy ballpark
    assert 0.5 * a.sum() < b.sum() < 2.0 * a.sum()
