"""Image-based bokeh aperture importance sampling.

TPU-native equivalent of the reference's ``imageData`` class
(zpelgrims/pota ``src/imagebokeh.h:30-413``): build a sorted row CDF and
per-row sorted column CDFs from the aperture image's luminance, then invert
them with two binary searches per sample.  The construction (host numpy at
load time) mirrors the reference exactly — including the descending-sort
index indirection and the pixel->[-1,1] flip — so sample distributions
match; the per-sample inversion is ``jnp.searchsorted`` (vectorized,
jit-safe, TPU-friendly).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BokehImage:
    """Prebuilt CDF + alias tables for a square aperture image."""

    cdf_row: jnp.ndarray        # [Y] cumulative over sorted row sums
    row_indices: jnp.ndarray    # [Y] descending-sort indirection
    cdf_col: jnp.ndarray        # [Y, X] per-row cumulative over sorted columns
    col_indices: jnp.ndarray    # [Y, X] per-row descending-sort indirection
    alias_prob: jnp.ndarray     # [Y*X] Walker alias acceptance thresholds
    alias_idx: jnp.ndarray      # [Y*X] Walker alias partner pixels
    resolution: int = 0         # static

    def tree_flatten(self):
        return (
            (self.cdf_row, self.row_indices, self.cdf_col, self.col_indices,
             self.alias_prob, self.alias_idx),
            (self.resolution,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, resolution=aux[0])


def build_bokeh_cdf(pixels: np.ndarray) -> BokehImage:
    """Build the sampler tables from an [H, W, C>=1] float image.

    Mirrors imageData::bokehProbability (ref src/imagebokeh.h:143-338):
    luminance 0.3/0.59/0.11, normalize, row-sum CDF over *descending-sorted*
    rows, then per-row column CDFs over descending-sorted columns.
    """
    pixels = np.asarray(pixels, np.float64)
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w = pixels.shape[:2]
    assert h == w, "bokeh image must be square (ref src/imagebokeh.h:97-101)"
    c = pixels.shape[2]
    o1 = 1 if c >= 2 else 0
    o2 = 2 if c >= 3 else o1
    lum = (
        pixels[..., 0] * 0.3 + pixels[..., o1] * 0.59 + pixels[..., o2] * 0.11
    )
    total = lum.sum()
    assert total > 0, "bokeh image is black"
    norm = lum / total

    row_sums = norm.sum(axis=1)                      # [Y]
    row_indices = np.argsort(-row_sums, kind="stable")
    cdf_row = np.cumsum(row_sums[row_indices])

    # per-row normalized values + descending column sort
    safe_rows = np.where(row_sums > 0, row_sums, 1.0)[:, None]
    per_row = np.where(norm > 0, norm / safe_rows, 0.0)
    col_indices = np.argsort(-per_row, axis=1, kind="stable")
    sorted_cols = np.take_along_axis(per_row, col_indices, axis=1)
    cdf_col = np.cumsum(sorted_cols, axis=1)

    alias_prob, alias_idx = _build_alias(norm.ravel())
    return BokehImage(
        cdf_row=jnp.asarray(cdf_row, jnp.float32),
        row_indices=jnp.asarray(row_indices, jnp.int32),
        cdf_col=jnp.asarray(cdf_col, jnp.float32),
        col_indices=jnp.asarray(col_indices, jnp.int32),
        alias_prob=jnp.asarray(alias_prob, jnp.float32),
        alias_idx=jnp.asarray(alias_idx, jnp.int32),
        resolution=int(w),
    )


def _build_alias(p: np.ndarray):
    """Walker alias table over the pixel multinomial ``p`` (sums to 1).

    O(1) inversion replaces the per-sample ``searchsorted`` CDF walk — the
    r4 profile measured 1.3 s per 2M searchsorted queries on TPU, while the
    alias method is two elementwise gathers from a small table.  The
    sampled distribution is the SAME pixel multinomial as the reference's
    sorted-CDF inversion (ref src/imagebokeh.h:341-412); only the mapping
    from uniforms to pixels differs.
    """
    k = p.size
    scaled = p * k
    alias = np.zeros(k, np.int64)
    prob = np.ones(k, np.float64)
    small = [i for i in range(k) if scaled[i] < 1.0]
    large = [i for i in range(k) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    return prob, alias


def load_bokeh_image(path: str) -> BokehImage:
    """Load an aperture image (png/jpg via PIL, or our EXR) and build CDFs."""
    if path.lower().endswith(".exr"):
        from ..io.exr import read_exr

        planes = read_exr(path)
        keys = [k for k in ("R", "G", "B") if k in planes]
        img = np.stack([planes[k] for k in keys], -1)
    else:
        from PIL import Image

        img = np.asarray(Image.open(path), np.float32) / 255.0
    return build_bokeh_cdf(img)


def _pixel_to_unit(res: int, row, col):
    """Pixel (row, col) -> [-1, 1]^2 aperture point, including the
    row/column flip that orients the image (ref src/imagebokeh.h:395-410,
    identical to the tail of :func:`bokeh_sample`)."""
    half = (res - 1) // 2
    recalc_row = row.astype(jnp.float32) - half
    recalc_col = col.astype(jnp.float32) - half
    return jnp.stack(
        [recalc_col / res * 2.0, -recalc_row / res * 2.0], -1
    )


def bokeh_sample_alias(bi: BokehImage, r1, r2):
    """O(1) alias-method inversion: two uniforms -> point in [-1, 1]^2.

    Samples the exact pixel multinomial of :func:`bokeh_sample` (same
    distribution as the reference's double-binary-search inversion) with
    two elementwise gathers from the Walker table instead of per-sample
    ``searchsorted`` — the production sampler for both the forward
    vignetting retries and the backward splat queue.
    """
    res = bi.resolution
    k = res * res
    j = jnp.clip((r1 * k).astype(jnp.int32), 0, k - 1)
    keep = r2 < bi.alias_prob[j]
    choice = jnp.where(keep, j, bi.alias_idx[j])
    return _pixel_to_unit(res, choice // res, choice % res)


def bokeh_sample(bi: BokehImage, r_row, r_col):
    """Invert the CDFs: two uniforms -> point in [-1, 1]^2.

    Mirrors imageData::bokehSample (ref src/imagebokeh.h:341-412), including
    the row/column flip that orients the image correctly.
    """
    x = bi.resolution
    y = bi.resolution
    r = jnp.clip(
        jnp.searchsorted(bi.cdf_row, r_row, side="right"), 0, y - 1
    )
    actual_row = bi.row_indices[r]

    c_rel = jnp.clip(
        jax.vmap(
            lambda row, u: jnp.searchsorted(bi.cdf_col[row], u, side="right"),
            in_axes=(0, 0),
        )(actual_row.reshape(-1), jnp.asarray(r_col).reshape(-1)).reshape(
            jnp.shape(r_col)
        ),
        0,
        x - 1,
    )
    actual_col = jax.vmap(lambda row, cc: bi.col_indices[row, cc])(
        actual_row.reshape(-1), c_rel.reshape(-1)
    ).reshape(jnp.shape(r_col))

    recalc_row = actual_row - (x - 1) // 2
    recalc_col = actual_col - (y - 1) // 2

    flipped_row = recalc_col.astype(jnp.float32)
    flipped_col = -recalc_row.astype(jnp.float32)
    return jnp.stack(
        [flipped_row / x * 2.0, flipped_col / y * 2.0], -1
    )
