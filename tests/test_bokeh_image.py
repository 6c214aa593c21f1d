"""Image-based bokeh sampler: distribution matches the image's luminance."""
import numpy as np
import jax.numpy as jnp

from pota_tpu.render.bokeh_image import build_bokeh_cdf, bokeh_sample


def test_point_mass_image():
    """All luminance in one pixel -> every sample lands on that pixel."""
    img = np.zeros((9, 9))
    img[2, 7] = 1.0  # row 2, col 7
    bi = build_bokeh_cdf(img)
    r = jnp.asarray(np.random.default_rng(0).uniform(size=(256, 2)), jnp.float32)
    pts = np.asarray(bokeh_sample(bi, r[:, 0], r[:, 1]))
    assert np.allclose(pts, pts[0]), "all samples must be identical"
    # reference mapping: flipped_row = col - (x-1)/2, flipped_col = -(row - (y-1)/2)
    want = np.array([(7 - 4) / 9 * 2.0, -(2 - 4) / 9 * 2.0])
    np.testing.assert_allclose(pts[0], want, atol=1e-6)


def test_two_blob_mass_ratio():
    img = np.zeros((16, 16))
    img[4, 4] = 3.0
    img[12, 10] = 1.0
    bi = build_bokeh_cdf(img)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.uniform(size=(4096, 2)), jnp.float32)
    pts = np.asarray(bokeh_sample(bi, r[:, 0], r[:, 1]))
    uniq, counts = np.unique(pts.round(4), axis=0, return_counts=True)
    assert len(uniq) == 2
    ratio = counts.max() / counts.min()
    assert 2.5 < ratio < 3.6, ratio


def test_uniform_disk_image_centered():
    yy, xx = np.mgrid[:32, :32]
    r2 = (yy - 15.5) ** 2 + (xx - 15.5) ** 2
    img = (r2 < 12**2).astype(np.float64)
    bi = build_bokeh_cdf(img)
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.uniform(size=(8192, 2)), jnp.float32)
    pts = np.asarray(bokeh_sample(bi, r[:, 0], r[:, 1]))
    assert np.abs(pts.mean(0)).max() < 0.05
    assert np.linalg.norm(pts, axis=-1).max() <= 12 / 32 * 2 + 0.1
