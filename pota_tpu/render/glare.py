"""FFT glare imager: physically-motivated aperture-diffraction bloom.

The reference shipped only a skeleton of this idea
(/root/reference/src/deprecated/lentil_glare_imager.cpp — an imager whose
``node_update`` sketches "calculate obstacle picture (fft(aperture*
obstacle))" in comments, C17 in SURVEY.md).  This module is the completed
TPU-native capability:

* the far-field (Fraunhofer) diffraction pattern of the iris is
  ``|FFT2(aperture transmission)|^2`` — an n-blade iris yields the classic
  2n-spike starburst (n even: n spikes overlap pairwise);
* glare = threshold the frame's highlights, convolve with that PSF
  (padded FFT convolution — one big batched matmul-class op XLA maps well
  onto TPU), and add back scaled by ``intensity``;
* chromatic streaking scales the PSF per channel with wavelength
  (diffraction angle is proportional to lambda).

Everything is pure jnp and differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def aperture_mask(size: int = 256, blades: int = 0,
                  radius: float = 0.9) -> jnp.ndarray:
    """Aperture transmission mask [size, size] in [0, 1].

    ``blades < 3`` gives a circular iris; otherwise a regular ``blades``-gon
    (the same iris model the samplers use, ref src/lentil.h:964-982).
    """
    y, x = np.mgrid[0:size, 0:size]
    cx = (size - 1) / 2.0
    u = (x - cx) / (size / 2.0)
    v = (y - cx) / (size / 2.0)
    r = np.sqrt(u * u + v * v)
    if blades < 3:
        mask = (r <= radius).astype(np.float32)
    else:
        theta = np.arctan2(v, u)
        # distance to the polygon edge in this direction (apothem form)
        seg = np.pi / blades
        local = np.mod(theta + seg, 2 * seg) - seg
        edge = radius * np.cos(seg) / np.maximum(np.cos(local), 1e-6)
        mask = (r <= edge).astype(np.float32)
    return jnp.asarray(mask)


def diffraction_psf(mask: jnp.ndarray, out_size: int | None = None,
                    chroma: float = 0.0) -> jnp.ndarray:
    """Far-field diffraction PSF of an aperture mask -> [H, W, 3], each
    channel normalized to unit energy.

    ``chroma`` in [0, 1] scales the per-channel wavelength spread (R
    spreads wider than B, since the diffraction angle grows with lambda).
    """
    n = mask.shape[0]
    psf = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(mask))) ** 2
    size = out_size or n
    # radial wavelength scaling per channel: lambda_R/lambda_G ~ 1.18,
    # lambda_B/lambda_G ~ 0.85 at full chroma
    scales = 1.0 + chroma * jnp.asarray([0.18, 0.0, -0.15])

    yy, xx = jnp.mgrid[0:size, 0:size]
    c = (size - 1) / 2.0
    chans = []
    for s in scales:
        # sample the PSF at coordinates shrunk by the channel scale
        sy = (yy - c) / s + (n - 1) / 2.0
        sx = (xx - c) / s + (n - 1) / 2.0
        iy = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, n - 1)
        ix = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, n - 1)
        inside = (sy >= 0) & (sy <= n - 1) & (sx >= 0) & (sx <= n - 1)
        ch = jnp.where(inside, psf[iy, ix], 0.0)
        chans.append(ch / jnp.maximum(ch.sum(), 1e-20))
    return jnp.stack(chans, -1)


def apply_glare(image: jnp.ndarray, psf: jnp.ndarray,
                threshold: float = 1.0,
                intensity: float = 0.1) -> jnp.ndarray:
    """Add aperture-diffraction glare to a rendered frame.

    ``image`` [H, W, 3|4]; ``psf`` [h, w, 3] unit-energy per channel.
    Highlights above ``threshold`` are convolved with the PSF (padded FFT
    convolution, linear not circular) and added back scaled by
    ``intensity``.  Energy above threshold is PRESERVED: the glare term
    redistributes ``intensity`` x highlight energy and the source keeps
    ``1 - intensity`` of it — like the bidirectional filter, glare moves
    energy, it does not create it.
    """
    rgb = image[..., :3]
    h, w = rgb.shape[:2]
    ph, pw = psf.shape[:2]
    hi = jnp.maximum(rgb - threshold, 0.0)

    fh, fw = h + ph - 1, w + pw - 1
    img_f = jnp.fft.rfft2(jnp.pad(hi, ((0, fh - h), (0, fw - w), (0, 0))),
                          axes=(0, 1))
    psf_f = jnp.fft.rfft2(jnp.pad(psf, ((0, fh - ph), (0, fw - pw), (0, 0))),
                          axes=(0, 1))
    conv = jnp.fft.irfft2(img_f * psf_f, s=(fh, fw), axes=(0, 1))
    oy, ox = ph // 2, pw // 2
    glare = jnp.maximum(conv[oy:oy + h, ox:ox + w], 0.0)

    out_rgb = rgb - intensity * hi + intensity * glare
    if image.shape[-1] == 4:
        return jnp.concatenate([out_rgb, image[..., 3:4]], -1)
    return out_rgb


def resolve_with_glare(image: jnp.ndarray, blades: int = 0,
                       threshold: float = 1.0, intensity: float = 0.1,
                       chroma: float = 0.0, psf_size: int = 128):
    """One-call imager: build the iris PSF and apply it to a frame."""
    mask = aperture_mask(psf_size, blades)
    psf = diffraction_psf(mask, chroma=chroma)
    return apply_glare(image, psf, threshold=threshold, intensity=intensity)
