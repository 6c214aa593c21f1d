"""Minimal analytic scene: spheres + emissive skydome + directional light.

The reference delegates all visibility to Arnold's ray-tracing core
(``AiTraceProbe``, zpelgrims/pota ``src/lentil.h:622-629`` /
``src/lentil_filter.cpp:355-375``) and its test scenes are grids of small
emissive spheres plus quad lights (``tests/po_bidir_debug/po_bidir_debug.ass``,
``tests/cuda/lightgrid.ass``).  The TPU build needs its own visibility
tracer (SURVEY.md §7.3): this module provides a fully-vectorized sphere
scene that serves as both the shading source for the forward pass and the
occlusion oracle for the backward redistribution probes.

Everything is a jnp array pytree; intersection is brute-force [N_rays, S]
which XLA fuses into a single pass — ideal for scenes of tens/hundreds of
spheres (the reference's test scenes have <100).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.float32(1e30)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SphereScene:
    centers: jnp.ndarray       # [S, 3] world space
    radii: jnp.ndarray         # [S]
    emission: jnp.ndarray      # [S, 3]
    albedo: jnp.ndarray        # [S, 3]
    sky_color: jnp.ndarray     # [3] skydome radiance
    light_dir: jnp.ndarray     # [3] direction *toward* the light
    light_color: jnp.ndarray   # [3]
    # optional thin-glass transmission color per sphere ([S, 3] or None):
    # transmissive spheres pass the radiance behind them straight through,
    # and shade() reports the transmitted part as a separate "transmission"
    # stream field — the per-sample transmission AOV the reference filter
    # subtracts before redistribution (src/lentil_filter.cpp:152-159)
    transmission: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (
            (self.centers, self.radii, self.emission, self.albedo,
             self.sky_color, self.light_dir, self.light_color,
             self.transmission),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ------------------------------------------------------------------
    def intersect(self, origins, dirs, t_min=1e-3):
        """Nearest hit. Returns (t [N], idx [N], hit [N])."""
        from ..optics.geometry import safe_sqrt

        oc = origins[:, None, :] - self.centers[None, :, :]      # [N,S,3]
        b = jnp.sum(oc * dirs[:, None, :], -1)                   # [N,S]
        c = jnp.sum(oc * oc, -1) - self.radii[None, :] ** 2
        disc = b * b - c
        sq = safe_sqrt(disc)  # NaN-free gradients on the miss branch
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where(t0 > t_min, t0, t1)
        valid = (disc > 0.0) & (t > t_min)
        t = jnp.where(valid, t, INF)
        idx = jnp.argmin(t, axis=-1)
        tbest = jnp.take_along_axis(t, idx[:, None], 1)[:, 0]
        return tbest, idx, tbest < INF

    def occluded(self, p_from, p_to, t_min=1e-3):
        """Segment occlusion probe between two world points -> bool [N].

        TPU equivalent of the reference's AiTraceProbe shadow rays in the
        backward redistribution loop.
        """
        seg = p_to - p_from
        dist2 = jnp.sum(seg * seg, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
        d = seg / dist[..., None]
        t, _, hit = self.intersect(p_from, d, t_min)
        return hit & (t < dist - t_min)

    def shade(self, origins, dirs):
        """Shade primary rays: emission + lambert direct light + sky.

        Returns dict of per-sample AOVs: rgba [N,4], z [N], P [N,3] (world),
        hit [N].  Depth Z follows Arnold's convention (distance along ray);
        misses get +inf like the reference's skydome samples
        (src/lentil_filter.cpp:122).
        """
        t, idx, hit = self.intersect(origins, dirs)
        p = origins + dirs * t[:, None]
        n = (p - self.centers[idx]) / self.radii[idx][:, None]
        emis = self.emission[idx]
        alb = self.albedo[idx]

        ndotl = jnp.maximum(jnp.sum(n * self.light_dir[None, :], -1), 0.0)
        # shadow probe toward the (directional) light
        shadow_org = p + n * 1e-3
        shadow_hit = self._occluded_dir(shadow_org, self.light_dir)
        direct = alb * self.light_color[None, :] * jnp.where(
            shadow_hit, 0.0, ndotl
        )[:, None]

        rgb = jnp.where(hit[:, None], emis + direct, self.sky_color[None, :])

        out = {}
        if self.transmission is not None:
            # thin-glass straight-through transmission: continue the ray
            # from the exit point and gather the radiance behind, tinted by
            # the glass color.  One bounce is enough for the filter's
            # transmission-AOV contract (the reference gets this from
            # Arnold's transmission AOV, src/lentil_filter.cpp:152-159).
            t_exit = t + 2.0 * jnp.abs(
                jnp.sum((self.centers[idx] - p) * dirs, -1)
            )
            exit_org = origins + dirs * (t_exit + 1e-3)[:, None]
            t2, idx2, hit2 = self.intersect(exit_org, dirs)
            behind = jnp.where(
                hit2[:, None], self.emission[idx2], self.sky_color[None, :]
            )
            tint = self.transmission[idx]
            transmitted = jnp.where(
                hit[:, None], tint * behind, jnp.zeros_like(rgb)
            )
            rgb = rgb + transmitted
            out["transmission"] = transmitted

            # depth-iterated opacity-weighted crypto coverage layers
            # (the cache the reference builds per sample from Arnold's depth
            # sub-samples, src/lentil.h:780-811): the front surface takes
            # opacity x transparency-so-far, the leftover quota folds into
            # the last depth sample (the behind hit, or the front surface
            # itself when nothing is behind)
            grey = (tint[:, 0] + tint[:, 1] + tint[:, 2]) / 3.0
            opacity_front = jnp.clip(1.0 - grey, 0.0, 1.0)
            w_front = jnp.where(hit, opacity_front, 0.0)
            w_back = jnp.where(hit, 1.0 - opacity_front, 0.0)
            id_back = jnp.where(hit2, idx2, idx).astype(jnp.int32)
            out["crypto_ids"] = jnp.stack(
                [jnp.where(hit, idx, -1).astype(jnp.int32), id_back], -1
            )
            out["crypto_weights"] = jnp.stack([w_front, w_back], -1)

        alpha = jnp.where(hit, 1.0, 0.0)
        rgba = jnp.concatenate([rgb, alpha[:, None]], -1)
        z = jnp.where(hit, t, INF)
        p_out = jnp.where(hit[:, None], p, jnp.zeros_like(p))
        obj_id = jnp.where(hit, idx, -1).astype(jnp.int32)
        return {"rgba": rgba, "z": z, "P": p_out, "hit": hit,
                "obj_id": obj_id, **out}

    @property
    def n_objects(self) -> int:
        return int(self.centers.shape[0])

    def _occluded_dir(self, origins, direction):
        d = jnp.broadcast_to(direction[None, :], origins.shape)
        _, _, hit = self.intersect(origins, d)
        return hit


def lightgrid_scene(
    n: int = 5,
    spacing: float = 12.0,
    radius: float = 0.35,
    z: float = -220.0,
    intensity: float = 30.0,
    sky: float = 0.0,
) -> SphereScene:
    """Grid of small bright emissive spheres — the reference's bokeh
    acceptance scene (tests/cuda/lightgrid.ass, tests/aberrations)."""
    xs = (np.arange(n) - (n - 1) / 2.0) * spacing
    cx, cy = np.meshgrid(xs, xs)
    centers = np.stack(
        [cx.ravel(), cy.ravel(), np.full(n * n, z)], -1
    ).astype(np.float32)
    s = n * n
    # vary the colors a bit so chromatic tests are meaningful
    rng = np.random.default_rng(7)
    colors = 0.5 + 0.5 * rng.uniform(size=(s, 3)).astype(np.float32)
    return SphereScene(
        centers=jnp.asarray(centers),
        radii=jnp.full((s,), radius, jnp.float32),
        emission=jnp.asarray(colors * intensity),
        albedo=jnp.zeros((s, 3), jnp.float32),
        sky_color=jnp.full((3,), sky, jnp.float32),
        light_dir=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        light_color=jnp.zeros((3,), jnp.float32),
    )


def teapot_scene() -> SphereScene:
    """Nine-sphere + highlight scene in the spirit of
    tests/po_bidir_debug/po_bidir_debug.ass: diffuse spheres at varying
    depths plus a few very bright small emitters out of focus."""
    centers = []
    radii = []
    emission = []
    albedo = []
    # diffuse spheres at staggered depths
    for i, (x, zdepth) in enumerate(
        [(-30, -120), (-15, -160), (0, -200), (15, -260), (30, -330)]
    ):
        centers.append([x, -5.0, zdepth])
        radii.append(10.0)
        emission.append([0.0, 0.0, 0.0])
        albedo.append([0.4 + 0.1 * (i % 3), 0.5, 0.7 - 0.1 * (i % 2)])
    # bright pinpoint highlights (out of focus bokeh sources)
    for x, y, zdepth, c in [
        (-25, 18, -300, [40.0, 30.0, 8.0]),
        (0, 22, -350, [10.0, 35.0, 45.0]),
        (28, 16, -280, [45.0, 12.0, 30.0]),
    ]:
        centers.append([x, y, zdepth])
        radii.append(0.6)
        emission.append(c)
        albedo.append([0.0, 0.0, 0.0])
    return SphereScene(
        centers=jnp.asarray(centers, jnp.float32),
        radii=jnp.asarray(radii, jnp.float32),
        emission=jnp.asarray(emission, jnp.float32),
        albedo=jnp.asarray(albedo, jnp.float32),
        sky_color=jnp.asarray([0.02, 0.02, 0.03], jnp.float32),
        light_dir=jnp.asarray([0.3, 0.8, 0.52], jnp.float32)
        / np.linalg.norm([0.3, 0.8, 0.52]),
        light_color=jnp.asarray([1.2, 1.1, 1.0], jnp.float32),
    )
