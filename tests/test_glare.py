"""FFT glare imager (the completed form of the reference's deprecated
skeleton, /root/reference/src/deprecated/lentil_glare_imager.cpp)."""
import numpy as np
import jax.numpy as jnp

from pota_tpu.render.glare import (
    aperture_mask, apply_glare, diffraction_psf, resolve_with_glare,
)


def test_aperture_masks():
    circ = np.asarray(aperture_mask(128, 0))
    hexa = np.asarray(aperture_mask(128, 6))
    assert 0.0 < circ.mean() < 1.0
    # hexagon is inscribed in the circle
    assert hexa.sum() < circ.sum()
    assert (hexa <= circ + 1e-6).all()


def test_psf_unit_energy_and_center_peak():
    psf = np.asarray(diffraction_psf(aperture_mask(128, 6)))
    assert psf.shape == (128, 128, 3)
    np.testing.assert_allclose(psf.sum((0, 1)), 1.0, rtol=1e-4)
    c = psf.shape[0] // 2
    for ch in range(3):
        assert psf[..., ch].max() == psf[c - 1:c + 1, c - 1:c + 1, ch].max()


def test_blade_psf_has_starburst_spikes():
    """A 6-blade iris diffracts into 6 starburst spikes (2n/2 for even n):
    the PSF's angular energy histogram must show n-fold symmetry peaks."""
    n_blades = 6
    psf = np.asarray(diffraction_psf(aperture_mask(256, n_blades)))[..., 1]
    s = psf.shape[0]
    y, x = np.mgrid[0:s, 0:s]
    c = (s - 1) / 2
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2)
    theta = np.arctan2(y - c, x - c)
    ring = (r > 20) & (r < s / 2 - 2)  # outside the airy core
    hist, _ = np.histogram(theta[ring], bins=360, weights=psf[ring])
    hist = hist / hist.sum()
    # energy in the n_blades spike directions beats the median direction
    top = np.sort(hist)[-n_blades * 6:].sum()
    assert top > 0.5, top  # spikes carry most of the ring energy


def test_glare_preserves_energy_and_only_above_threshold():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 0.5, (64, 64, 3)).astype(np.float32)
    img[32, 32] = 50.0  # one highlight
    psf = diffraction_psf(aperture_mask(64, 0))
    out = np.asarray(apply_glare(jnp.asarray(img), psf, threshold=1.0,
                                 intensity=0.2))
    # below-threshold image is untouched
    dark = np.asarray(apply_glare(jnp.asarray(np.clip(img, 0, 0.5)), psf,
                                  threshold=1.0, intensity=0.2))
    np.testing.assert_allclose(dark, np.clip(img, 0, 0.5), atol=1e-5)
    # the highlight spread to neighbors, total energy ~preserved (some
    # convolution tail exits the frame)
    assert out[32, 32].max() < img[32, 32].max()
    assert (out.sum() <= img.sum() + 1e-3)
    assert out.sum() > 0.95 * img.sum()


def test_resolve_with_glare_rgba_passthrough_alpha():
    img = np.zeros((32, 32, 4), np.float32)
    img[16, 16] = [10, 10, 10, 1]
    out = np.asarray(resolve_with_glare(jnp.asarray(img), blades=5,
                                        threshold=1.0, intensity=0.3,
                                        psf_size=32))
    assert out.shape == (32, 32, 4)
    np.testing.assert_array_equal(out[..., 3], img[..., 3])
    assert (out[..., :3] >= -1e-6).all()
