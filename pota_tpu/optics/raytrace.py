"""Sequential lens-element ray tracer (the ground-truth optic).

The reference approximates a full per-element trace with fitted polynomials;
its ground truth lives in the (unmounted) sibling repo ``polynomial-optics``
and survives in-tree only as the deprecated ray-traced camera
(zpelgrims/pota ``src/deprecated/lentil_raytraced.cpp``).  The TPU build
re-creates that ground truth natively: a ``lax.scan`` over the element stack,
fully batched over rays and differentiable end-to-end (SURVEY.md §7.2/C16).

Conventions
-----------
*  Lens space: sensor plane at z=0, +z toward the scene.  Rays are the 5-D
   light field [x, y, dx, dy, lambda]: position mm on the sensor plane,
   direction in two-plane parametrization (dz == 1 before normalization),
   wavelength in micrometers — exactly the reference's chart
   (src/lentil.h:1252-1256).
*  Prescriptions are stored scene->sensor (industry convention, light
   traveling +z' toward the image): rows of [radius, thickness, ior, abbe,
   housing_radius] like the reference's lens JSON
   (tests/aperture_sampling_debug/lens_writeout.py).  ``radius`` is signed
   with center-of-curvature toward the image for positive values; 0 means
   planar.  ``ior``/``abbe`` describe the medium *behind* the surface
   (toward the image); the aperture stop is a planar row with ior 1.
*  This module traces the *reverse* direction (sensor -> scene), which is
   what the polynomial functions pt_evaluate / pt_sample_aperture need.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Fraunhofer lines (um) used for the Abbe -> Cauchy conversion
_LAMBDA_D = 0.5876
_LAMBDA_F = 0.4861
_LAMBDA_C = 0.6563


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LensSystem:
    """Preprocessed element stack in sensor->scene order (jnp arrays).

    Fields (all [K] where K = number of surfaces, ordered rear->front):
      vertex_z:    surface vertex position (mm, sensor at z=0)
      radius:      signed curvature radius in the reversed frame
                   (center at vertex_z + radius); 0 => planar
      housing:     housing (clear semi-aperture) radius
      cauchy_a/b:  Cauchy coefficients of the medium *entered* when crossing
                   the surface in sensor->scene travel
      is_aperture: 1.0 at the iris plane
    Plus scalar metadata (python floats, static under jit).
    """

    vertex_z: jnp.ndarray
    radius: jnp.ndarray
    housing: jnp.ndarray
    cauchy_a_in: jnp.ndarray
    cauchy_b_in: jnp.ndarray
    cauchy_a_out: jnp.ndarray
    cauchy_b_out: jnp.ndarray
    is_aperture: jnp.ndarray
    # metadata
    lens_length: float          # front vertex - rear vertex (mm)
    back_focal_length: float    # rear vertex z (sensor at design focus for inf)
    efl: float                  # effective focal length (mm)
    aperture_z: float           # z of the iris plane
    aperture_housing_radius: float
    inner_pupil_radius: float   # housing of rear surface
    outer_pupil_radius: float   # housing of front surface
    inner_pupil_curvature_radius: float  # chart radius for the rear surface
    outer_pupil_curvature_radius: float  # chart radius for the front surface
    fov: float                  # full field of view (radians), from efl+36mm
    aperture_index: int = -1    # static index of the iris row (rear->front)
    name: str = "unnamed"
    # pupil chart geometry per lens ("sphere" / "cyl-x" / "cyl-y"), the
    # dispatch the reference does on lens_inner/outer_pupil_geometry
    # (src/lentil.h:387-389, 1418-1424); anamorphic designs are cylindrical
    outer_chart: str = "sphere"
    inner_chart: str = "sphere"
    # per-surface cylinder flag, rear->front (STATIC python tuple so the
    # unrolled trace branches at build time): 0 = sphere/plane, 1 =
    # curvature in x only (cylinder axis along y — the classic horizontal-
    # squeeze anamorphic element), 2 = curvature in y only.  Empty = all
    # spherical.
    cyl_axes: tuple = ()

    _ARRAY_FIELDS = (
        "vertex_z", "radius", "housing", "cauchy_a_in", "cauchy_b_in",
        "cauchy_a_out", "cauchy_b_out", "is_aperture",
    )

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._ARRAY_FIELDS)
        meta = tuple(
            getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name not in self._ARRAY_FIELDS
        )
        return children, meta

    @classmethod
    def tree_unflatten(cls, meta, children):
        return cls(*children, *meta)


def _cauchy_from_nd_abbe(nd: float, abbe: float):
    """Convert (n_d, V_d) to Cauchy A + B/lambda^2 (lambda in um)."""
    if nd <= 1.0 + 1e-6:
        return 1.0, 0.0
    if abbe <= 0.0:
        return nd, 0.0
    b = (nd - 1.0) / (abbe * (1.0 / _LAMBDA_F**2 - 1.0 / _LAMBDA_C**2))
    a = nd - b / _LAMBDA_D**2
    return a, b


def _paraxial_bfl_efl(rows: np.ndarray) -> tuple[float, float]:
    """Paraxial BFL and EFL of a scene->sensor prescription (numpy, f64).

    Standard y-u trace of a parallel marginal ray at the d-line.
    """
    y = 1.0
    u = 0.0
    n = 1.0
    for i, row in enumerate(rows):
        radius, thickness, ior = row[0], row[1], row[2]
        cyl = int(row[5]) if len(row) > 5 else 0
        n2 = ior if ior > 0 else 1.0
        # cylinder surfaces with curvature in x are FLAT in the y-z paraxial
        # plane this trace runs in (anamorphic attachments are near-afocal
        # in x, so the y-plane focus places the sensor for both axes)
        if radius != 0.0 and cyl != 1:
            power = (n2 - n) / radius
            u = (n * u - y * power) / n2
        n = n2
        if i < len(rows) - 1:
            y = y + u * thickness
    bfl = -y / u if u != 0 else np.inf
    efl = -1.0 / u if u != 0 else np.inf
    return float(bfl), float(efl)


def build_lens_system(rows, name: str = "unnamed",
                      sensor_width: float = 36.0,
                      outer_chart: str = "sphere",
                      inner_chart: str = "sphere") -> LensSystem:
    """Preprocess a scene->sensor prescription into a LensSystem.

    ``rows``: sequence of [radius, thickness, ior, abbe, housing_radius]
    (+ optional 6th column: cylinder flag, 0 = sphere, 1 = curvature in x /
    axis along y, 2 = curvature in y) scene->sensor; thickness of the last
    row is ignored (the sensor sits at the paraxial focus, i.e. BFL behind
    the rear vertex).  The aperture stop is the row with radius == 0 and
    ior == 1 (planar air interface).
    """
    rows = np.asarray(rows, np.float64)
    if rows.shape[1] > 5:
        cyl_std = rows[:, 5].astype(int)
    else:
        cyl_std = np.zeros(len(rows), int)
    n_surf = len(rows)
    bfl, efl = _paraxial_bfl_efl(rows)
    assert np.isfinite(bfl) and bfl > 0, f"{name}: bad BFL {bfl}"

    # vertex positions scene->sensor in standard frame: z_std[0]=0 at front
    z_std = np.concatenate([[0.0], np.cumsum(rows[:-1, 1])])
    lens_length = float(z_std[-1] - z_std[0])
    # reversed frame: sensor at 0, +z toward scene; rear vertex at bfl
    vertex_z = bfl + (z_std[-1] - z_std)          # [K] front has largest z
    # reversed order: rear -> front
    order = np.arange(n_surf)[::-1]
    vertex_z = vertex_z[order]
    radius_rev = -rows[order, 0]                   # sign flip in reversed frame

    # media: crossing surface i (standard index) in reverse travel enters the
    # medium *in front of* it (standard medium of row i-1; air for i=0)
    cauchy = np.array(
        [_cauchy_from_nd_abbe(r[2], r[3]) for r in rows]
    )  # medium behind row i (standard)
    a_behind = np.concatenate([cauchy[:, 0], [1.0]])
    b_behind = np.concatenate([cauchy[:, 1], [0.0]])
    # in reverse travel (sensor->scene), BEFORE crossing std-surface i the
    # ray is in the medium behind it (= medium(i)); AFTER crossing it is in
    # the medium in front (= medium(i-1); air for i=0).
    a_in = np.array([a_behind[i] for i in range(n_surf)])
    b_in = np.array([b_behind[i] for i in range(n_surf)])
    a_out = np.array([a_behind[i - 1] if i > 0 else 1.0 for i in range(n_surf)])
    b_out = np.array([b_behind[i - 1] if i > 0 else 0.0 for i in range(n_surf)])
    a_in, b_in, a_out, b_out = (
        a_in[order], b_in[order], a_out[order], b_out[order]
    )

    is_ap = ((rows[:, 0] == 0.0) & (np.abs(rows[:, 2] - 1.0) < 1e-9))[order]
    ap_idx_rev = int(np.argmax(is_ap)) if is_ap.any() else -1
    assert is_ap.any(), f"{name}: prescription has no aperture row"

    fov = 2.0 * np.arctan((sensor_width * 0.5) / efl)

    # cylindrical front/rear surfaces force the matching pupil chart (the
    # reference's per-lens lens_outer/inner_pupil_geometry dispatch):
    # curvature in x = cylinder axis along y = "cyl-y"
    cyl_rev = tuple(int(v) for v in cyl_std[order])
    _chart = {0: "sphere", 1: "cyl-y", 2: "cyl-x"}
    if outer_chart == "sphere" and cyl_rev[-1]:
        outer_chart = _chart[cyl_rev[-1]]
    if inner_chart == "sphere" and cyl_rev[0]:
        inner_chart = _chart[cyl_rev[0]]
    if not any(cyl_rev):
        cyl_rev = ()

    return LensSystem(
        vertex_z=jnp.asarray(vertex_z, jnp.float32),
        radius=jnp.asarray(radius_rev, jnp.float32),
        housing=jnp.asarray(rows[order, 4], jnp.float32),
        cauchy_a_in=jnp.asarray(a_in, jnp.float32),
        cauchy_b_in=jnp.asarray(b_in, jnp.float32),
        cauchy_a_out=jnp.asarray(a_out, jnp.float32),
        cauchy_b_out=jnp.asarray(b_out, jnp.float32),
        is_aperture=jnp.asarray(is_ap, jnp.float32),
        lens_length=lens_length,
        back_focal_length=float(bfl),
        efl=float(efl),
        aperture_z=float(vertex_z[ap_idx_rev]),
        aperture_housing_radius=float(rows[order, 4][ap_idx_rev]),
        inner_pupil_radius=float(rows[order, 4][0]),
        outer_pupil_radius=float(rows[order, 4][-1]),
        inner_pupil_curvature_radius=float(-radius_rev[0]),
        outer_pupil_curvature_radius=float(-radius_rev[-1]),
        fov=float(fov),
        aperture_index=ap_idx_rev,
        name=name,
        outer_chart=outer_chart,
        inner_chart=inner_chart,
        cyl_axes=cyl_rev,
    )


# ---------------------------------------------------------------- tracing ----


def _ior(a, b, lam):
    return a + b / (lam * lam)


def _intersect_surface(pos, direction, vertex_z, radius, cyl: int = 0):
    """Intersect rays with a spherical, cylindrical, or planar surface.

    ``cyl``: 0 = sphere, 1 = cylinder with curvature in x (axis along y,
    the horizontal-squeeze anamorphic element), 2 = curvature in y (axis
    along x).  STATIC — the trace loop unrolls per surface.

    Picks the root on the vertex side: the hit whose z-offset from the
    center has the same sign as (vertex - center) = -radius.
    Returns (t, hit, normal, ok) with the normal oriented against the ray.
    """
    planar = radius == 0.0
    # plane
    t_plane = (vertex_z - pos[..., 2]) / direction[..., 2]

    center_z = vertex_z + radius
    zero = jnp.zeros_like(pos[..., 0])
    if cyl == 0:
        center = jnp.stack(
            [zero, zero, jnp.broadcast_to(center_z, zero.shape)], -1
        )
        oc = pos - center
        a = jnp.ones_like(zero)
        b = jnp.sum(oc * direction, -1)
        c = jnp.sum(oc * oc, -1) - radius * radius
    else:
        # 2-D circle in the curved plane; the axis coordinate free-rides
        u = pos[..., 0] if cyl == 1 else pos[..., 1]
        du = direction[..., 0] if cyl == 1 else direction[..., 1]
        w = pos[..., 2] - center_z
        dw = direction[..., 2]
        a = du * du + dw * dw
        b = u * du + w * dw
        c = u * u + w * w - radius * radius
    a_safe = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    disc = b * b - a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / a_safe
    t1 = (-b + sq) / a_safe
    # hit z relative to center must have sign of -radius (vertex side)
    z0 = pos[..., 2] + t0 * direction[..., 2] - center_z
    pick0 = jnp.sign(z0) == jnp.sign(-radius)
    t_curved = jnp.where(pick0, t0, t1)
    t = jnp.where(planar, t_plane, t_curved)
    ok = jnp.where(planar, t_plane > 0, ok & (t_curved > 0))

    hit = pos + t[..., None] * direction
    if cyl == 0:
        center = jnp.stack(
            [zero, zero, jnp.broadcast_to(center_z, zero.shape)], -1
        )
        n_curved = (hit - center) / radius
    elif cyl == 1:
        n_curved = jnp.stack(
            [hit[..., 0] / radius, zero, (hit[..., 2] - center_z) / radius],
            -1,
        )
    else:
        n_curved = jnp.stack(
            [zero, hit[..., 1] / radius, (hit[..., 2] - center_z) / radius],
            -1,
        )
    n_plane = jnp.broadcast_to(
        jnp.array([0.0, 0.0, -1.0], hit.dtype), hit.shape
    )
    normal = jnp.where(planar, n_plane, n_curved)
    # orient normal against the direction of travel
    flip = jnp.sum(normal * direction, -1, keepdims=True) > 0
    normal = jnp.where(flip, -normal, normal)
    return t, hit, normal, ok


def _refract(direction, normal, eta):
    """Snell refraction (vector form); returns (new_dir, total_internal_refl)."""
    cos_i = -jnp.sum(direction * normal, -1)
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    refr = (
        eta[..., None] * direction
        + (eta * cos_i - cos_t)[..., None] * normal
    )
    refr = refr / jnp.maximum(
        jnp.linalg.norm(refr, axis=-1, keepdims=True), 1e-12
    )
    return refr, tir


def _fresnel_unpolarized(cos_i, cos_t, n1, n2):
    rs = (n1 * cos_i - n2 * cos_t) / jnp.maximum(n1 * cos_i + n2 * cos_t, 1e-12)
    rp = (n1 * cos_t - n2 * cos_i) / jnp.maximum(n1 * cos_t + n2 * cos_i, 1e-12)
    return 1.0 - 0.5 * (rs * rs + rp * rp)


@jax.jit
def trace_sensor_to_scene(lens: LensSystem, sensor_lf, aperture_radius=None):
    """Trace 5-D sensor light-field rays through the element stack.

    Args:
      sensor_lf: [..., 5] = [x, y, dx, dy, lambda_um] at the (unshifted)
        sensor plane z=0.
      aperture_radius: optional iris radius (mm); defaults to the housing
        radius (wide open).

    Returns dict with:
      out_pos, out_dir: [...,3] exit ray at the front surface (lens space)
      transmittance: [...] Fresnel product, 0 where clipped/TIR/missed
      aperture_xy: [...,2] hit position on the iris plane
      valid: [...] bool
    """
    x, y, dx, dy, lam = (sensor_lf[..., i] for i in range(5))
    pos = jnp.stack([x, y, jnp.zeros_like(x)], -1)
    direction = jnp.stack([dx, dy, jnp.ones_like(dx)], -1)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)

    ap_r = (
        lens.aperture_housing_radius if aperture_radius is None
        else aperture_radius
    )

    trans = jnp.ones_like(x)
    valid = jnp.ones_like(x, dtype=bool)
    ap_xy = jnp.zeros_like(pos[..., :2])

    n_surf = lens.vertex_z.shape[0]
    for k in range(n_surf):  # static unroll; K ~ 5-12 surfaces
        vz = lens.vertex_z[k]
        rad = lens.radius[k]
        cyl = lens.cyl_axes[k] if lens.cyl_axes else 0
        t, hit, normal, ok = _intersect_surface(pos, direction, vz, rad, cyl)
        r2 = hit[..., 0] ** 2 + hit[..., 1] ** 2
        inside = r2 <= lens.housing[k] ** 2
        if k == lens.aperture_index:  # static branch per lens
            ap_xy = hit[..., :2]
            inside = r2 <= ap_r**2
            new_dir = direction
            f = jnp.ones_like(x)
        else:
            n1 = _ior(lens.cauchy_a_in[k], lens.cauchy_b_in[k], lam)
            n2 = _ior(lens.cauchy_a_out[k], lens.cauchy_b_out[k], lam)
            eta = n1 / n2
            cos_i = -jnp.sum(direction * normal, -1)
            new_dir, tir = _refract(direction, normal, eta)
            cos_t = -jnp.sum(new_dir * normal, -1)
            f = _fresnel_unpolarized(cos_i, jnp.abs(cos_t), n1, n2)
            ok = ok & ~tir
        valid = valid & ok & inside
        trans = trans * jnp.where(valid, f, 0.0)
        pos = hit
        direction = new_dir

    return {
        "out_pos": pos,
        "out_dir": direction,
        "transmittance": jnp.where(valid, trans, 0.0),
        "aperture_xy": ap_xy,
        "valid": valid,
    }


@jax.jit
def trace_to_chart(lens: LensSystem, sensor_lf, aperture_radius=None):
    """Trace and return the exit ray in the outer-pupil sphere chart.

    The chart matches the reference's pt_evaluate output contract
    (src/lentil.h:1252-1266 + sphereToCs/cylinderToCs at :387-389):
    [x, y, dx, dy] on the sphere (or cylinder, for anamorphic pupils) of
    radius ``outer_pupil_curvature_radius`` with vertex at the front
    surface, plus transmittance.  The chart is ``lens.outer_chart``.
    """
    from . import geometry as geo

    res = trace_sensor_to_scene(lens, sensor_lf, aperture_radius)
    front_z = lens.vertex_z[-1]
    pos = res["out_pos"] - jnp.stack(
        [jnp.zeros_like(res["out_pos"][..., 0]),
         jnp.zeros_like(res["out_pos"][..., 0]),
         jnp.broadcast_to(front_z, res["out_pos"][..., 0].shape)], -1
    )
    R = lens.outer_pupil_curvature_radius
    d = res["out_dir"]
    if lens.outer_chart != "sphere":
        # the exit position sits on the (possibly spherical) front element;
        # a cylinder chart parametrizes points ON the cylinder of radius R
        # (axis at z=-R), so advance the exit ray onto that surface first
        # (the chart stores a ray line, so sliding along the ray is exact)
        u = pos[..., 0] if lens.outer_chart == "cyl-y" else pos[..., 1]
        du = d[..., 0] if lens.outer_chart == "cyl-y" else d[..., 1]
        w = pos[..., 2] + R
        dw = d[..., 2]
        a = du * du + dw * dw
        b = u * du + w * dw
        c = u * u + w * w - R * R
        disc = jnp.maximum(b * b - a * c, 0.0)
        sq = jnp.sqrt(disc)
        a_safe = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
        t0 = (-b - sq) / a_safe
        t1 = (-b + sq) / a_safe
        # nearest intersection along the ray (smallest |t|)
        t = jnp.where(jnp.abs(t0) <= jnp.abs(t1), t0, t1)
        pos = pos + t[..., None] * d
    pos2, dir2 = geo.cs_to_chart(pos, d, -R, R, lens.outer_chart)
    out = jnp.concatenate([pos2, dir2], -1)
    return out, res["transmittance"], res["aperture_xy"], res["valid"]
