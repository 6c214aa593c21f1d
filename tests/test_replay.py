"""Golden capture/replay: offline re-splat reproduces the live render."""
import numpy as np
import jax.numpy as jnp

from pota_tpu import CameraConfig, RenderConfig
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_sample_stream, render_frame
from pota_tpu.render.replay import (
    load_capture,
    replay_splat,
    save_capture,
    stream_from_capture,
    capture_stream,
)

CFG = CameraConfig(focal_length=65.0, fstop=1.8, focus_distance=150.0,
                   vignetting_retries=1, max_bidir_samples=8)
RC = RenderConfig(xres=32, yres=32, spp=2)
M = look_at([0, 0, 0], [0, 0, -1])


def test_capture_schema_roundtrip():
    scene = sc.lightgrid_scene(n=2, spacing=40.0, z=-400.0, radius=4.0,
                               intensity=30.0)
    stream = render_sample_stream(CFG, RC, scene, M, seed=0)
    data = capture_stream(stream)
    back = stream_from_capture(data)
    np.testing.assert_array_equal(np.asarray(back["px"]), np.asarray(stream["px"]))
    np.testing.assert_allclose(np.asarray(back["rgba"]),
                               np.asarray(stream["rgba"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back["P"]),
                               np.asarray(stream["P"]), rtol=1e-6)


def test_replay_matches_live_render(tmp_path):
    scene = sc.lightgrid_scene(n=2, spacing=40.0, z=-400.0, radius=4.0,
                               intensity=30.0)
    img_live, _ = render_frame(CFG, RC, scene, M, seed=0)

    stream = render_sample_stream(CFG, RC, scene, M, seed=0)
    p = str(tmp_path / "golden.pstream")
    save_capture(p, stream)
    replayed = load_capture(p)
    img_replay, _ = replay_splat(CFG, RC, replayed, M, scene=scene)
    a, b = np.asarray(img_replay), np.asarray(img_live)
    # The replay runs splat_frame in its own compilation context; XLA fusion
    # differences can flip marginal occlusion/bounds gates for a few lanes
    # (same effect as the sharded-vs-single comparison), so compare
    # statistically: energy within 2%, almost all pixels equal.
    ea, eb = a[..., :3].sum(), b[..., :3].sum()
    assert abs(ea - eb) <= 0.02 * max(abs(eb), 1e-6), (ea, eb)
    frac = (np.abs(a - b).max(-1) > 1e-3).mean()
    assert frac < 0.02, frac


def test_replay_without_scene_no_occlusion(tmp_path):
    """NullScene replay still produces a finite image (prototype-style)."""
    scene = sc.lightgrid_scene(n=2, spacing=40.0, z=-400.0, radius=4.0,
                               intensity=30.0)
    stream = render_sample_stream(CFG, RC, scene, M, seed=0)
    img, fb = replay_splat(CFG, RC, stream, M, scene=None)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img[..., :3].sum() > 0
