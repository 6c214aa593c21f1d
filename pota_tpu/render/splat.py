"""Bidirectional energy redistribution as a differentiable scatter-splat.

This is the TPU-native heart of the framework: the reference's
``lentil_filter`` (zpelgrims/pota ``src/lentil_filter.cpp:66-480``) walks
every AA sample, decides redistribute-or-not through a gate chain, then
traces up to 2000 *backward* rays per bright sample — each with a scene
occlusion probe — splatting energy into shared full-frame buffers with
benign data races; ``imager_lentil`` later normalizes by the accumulated
filter weight (``src/lentil_imager.cpp:66-193``).

Here the whole thing is one fused array program:

* the gate chain becomes boolean masks (SURVEY.md §7.5);
* the per-sample adaptive budget [4, 2000] becomes a static K lane axis with
  a ``k < budget_i`` mask; per-splat weight is 1/successes so energy is
  conserved exactly like the reference's retry-until-success loop;
* the unsynchronized `+=` splats become deterministic ``scatter-add``
  (`.at[].add`), which also gives a clean linear VJP — the redistribution
  is differentiable end-to-end;
* closest-type AOVs use a two-pass scatter-min (depth race resolved
  deterministically, unlike the reference's tolerated races).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CameraConfig, CameraType, RenderConfig
from ..optics import aberrations, samplers, thinlens
from ..utils import rng as prng


def world_to_camera(cam_to_world):
    rot = cam_to_world[:3, :3]
    trans = cam_to_world[:3, 3]
    inv_rot = rot.T
    inv_trans = -inv_rot @ trans
    m = jnp.eye(4, dtype=cam_to_world.dtype)
    m = m.at[:3, :3].set(inv_rot)
    m = m.at[:3, 3].set(inv_trans)
    return m


def _luminance(rgb):
    # the reference's redistribution luminance is the channel mean
    # (src/lentil_filter.cpp:161)
    return (rgb[..., 0] + rgb[..., 1] + rgb[..., 2]) / 3.0


def compute_gates_and_budget(cfg: CameraConfig, rc: RenderConfig, stream,
                             cam_space_pos, po_lens=None, po_state=None):
    """The redistribute-or-not gate chain + per-sample backward budget.

    Ports the gates at src/lentil_filter.cpp:105-240 (skydome, CoC
    threshold, inside-lens, luminance-scaled budget in [4, 2000]).
    Returns (redistribute mask, budget [N] int, coc [N], skydome mask).
    """
    z = stream["z"]
    inv_density = 1.0 / rc.spp

    sky = (z >= 1e29) | (jnp.linalg.norm(stream["P"], axis=-1) < 1e-7)
    redistribute = jnp.ones_like(z, dtype=bool)
    if cfg.enable_skydome:
        ray_ok = jnp.linalg.norm(stream["raydir"], axis=-1) > 1e-7
        redistribute &= ~sky | ray_ok
    else:
        redistribute &= ~sky

    lum = _luminance(stream["rgba"])
    lum_mult = jnp.maximum(
        0.0, jnp.sqrt(jnp.minimum(lum, 20.0)) * cfg.bidir_sample_mult
    )
    if cfg.camera_type == CameraType.POLYNOMIAL_OPTICS:
        coc = thinlens.coc_thinlens(
            cfg, cam_space_pos[..., 2],
            aperture_radius=po_state.aperture_radius,
            focus_distance=po_state.focus_distance,
        )
        redistribute &= (
            jnp.abs(cam_space_pos[..., 2]) >= po_lens.lens_length * 0.1
        )
    else:
        coc = thinlens.coc_thinlens(cfg, cam_space_pos[..., 2])

    coc_px = (coc * rc.yres) ** 2 * lum_mult**2 * 1e-5
    # no redistribution under the empirical CoC threshold
    # (ref src/lentil_filter.cpp:183-187; same raw units as the reference)
    redistribute &= coc >= 0.4

    budget = jnp.ceil(coc_px * inv_density).astype(jnp.int32)
    budget = jnp.clip(budget, 4, 2000)
    return redistribute, budget, coc, sky


def thinlens_backward_project(cfg: CameraConfig, rc: RenderConfig,
                              cam_space_pos, seeds, k_idx, bokeh_cdf=None):
    """One backward thin-lens sample per (source, lane): scene point -> pixel.

    Port of the splat loop body at src/lentil_filter.cpp:311-446.
    Returns dict with pixel coords, lens point (camera space), rgb channel
    weight, validity pieces left to the caller (occlusion, bounds).
    """
    u = prng.uniforms(seeds, k_idx, 6)
    r1, r2, r3, r4, r5, _ = (u[..., i] for i in range(6))

    if cfg.bokeh_enable_image and bokeh_cdf is not None:
        from .bokeh_image import bokeh_sample
        unit_disk = bokeh_sample(bokeh_cdf, r1, r2)
    elif cfg.aperture_blades < 2:
        unit_disk = samplers.concentric_disk_sample_aberrated(
            r1, r2, cfg.effective_abb_spherical, cfg.effective_circle_to_square
        )
    else:
        unit_disk = samplers.triangular_aperture_sample(
            r1, r2, 1.0, cfg.aperture_blades
        )
    unit_disk = unit_disk.at[..., 0].multiply(cfg.effective_anamorphic)

    aperture_radius = cfg.thinlens_aperture_radius
    lens = jnp.concatenate(
        [unit_disk * aperture_radius, jnp.zeros_like(unit_disk[..., :1])], -1
    )

    f = cfg.effective_focal_length
    image_dist_samplepos = (-f * cam_space_pos[..., 2]) / (
        -f + cam_space_pos[..., 2]
    )

    dir_from_center = cam_space_pos / jnp.linalg.norm(
        cam_space_pos, axis=-1, keepdims=True
    )
    dir_lens_to_p = cam_space_pos - lens
    dir_lens_to_p = dir_lens_to_p / jnp.linalg.norm(
        dir_lens_to_p, axis=-1, keepdims=True
    )

    if cfg.abb_coma != 0.0:
        coma_mult = cfg.abb_coma * aberrations.coma_multiplier(
            cfg.sensor_width, f, dir_from_center, unit_disk
        )
        dir_lens_to_p = aberrations.coma_perturb(
            dir_lens_to_p, dir_from_center, coma_mult, reverse=True
        )
        cam_pos_perturbed = (
            jnp.linalg.norm(cam_space_pos, axis=-1, keepdims=True)
            * dir_lens_to_p
        )
        dir_from_center = cam_pos_perturbed / jnp.linalg.norm(
            cam_pos_perturbed, axis=-1, keepdims=True
        )
    else:
        cam_pos_perturbed = cam_space_pos

    samplepos_image_t = jnp.abs(
        image_dist_samplepos / dir_from_center[..., 2]
    )
    samplepos_image_point = dir_from_center * samplepos_image_t[..., None]

    dir_lens_to_image = samplepos_image_point - lens
    dir_lens_to_image = dir_lens_to_image / jnp.linalg.norm(
        dir_lens_to_image, axis=-1, keepdims=True
    )

    # optical vignetting gate
    if cfg.optical_vignetting_distance > 0.0:
        dl2p = cam_pos_perturbed - lens
        dl2p = dl2p / jnp.linalg.norm(dl2p, axis=-1, keepdims=True)
        ov_ok = aberrations.optical_vignetting_square(
            lens, dl2p, aperture_radius, cfg.optical_vignetting_radius,
            cfg.optical_vignetting_distance,
            samplers.lerp_squircle_mapping(cfg.effective_circle_to_square),
        )
    else:
        ov_ok = jnp.ones(lens.shape[:-1], dtype=bool)

    # chromatic aberration: one random channel per splat with a shifted
    # focus distance (ref src/lentil_filter.cpp:392-406)
    focusdist_t = jnp.abs(
        thinlens.image_dist_focusdist(cfg) / dir_lens_to_image[..., 2]
    )
    rgb_weight = jnp.ones(lens.shape[:-1] + (3,), lens.dtype)
    if cfg.abb_chromatic > 0.0:
        # sensor position of the unperturbed focus ray scales the shift
        fip_unp = lens + dir_lens_to_image * focusdist_t[..., None]
        sensor_unp = jnp.stack(
            [fip_unp[..., 0] / fip_unp[..., 2], fip_unp[..., 1] / fip_unp[..., 2]],
            -1,
        )
        dist_center = jnp.linalg.norm(sensor_unp, axis=-1)
        channel = jnp.floor(r5 * 3.0).astype(jnp.int32) - 1  # -1, 0, 1
        eye = jnp.asarray(
            [[3.0, 0.0, 0.0], [0.0, 3.0, 0.0], [0.0, 0.0, 3.0]], lens.dtype
        )
        rgb_weight = eye[channel + 1]
        from ..config import ChromaticType

        direction_shift = jnp.where(
            cfg.abb_chromatic_type == ChromaticType.GREEN_MAGENTA,
            jnp.abs(channel).astype(lens.dtype),
            channel.astype(lens.dtype),
        )
        shift = (
            direction_shift * cfg.abb_chromatic * 5.0 * dist_center
        )
        focusdist_t = jnp.abs(
            thinlens.image_dist_focusdist(cfg, shift)
            / dir_lens_to_image[..., 2]
        )

    focusdist_image_point = lens + dir_lens_to_image * focusdist_t[..., None]
    sensor_position = jnp.stack(
        [
            focusdist_image_point[..., 0] / focusdist_image_point[..., 2],
            focusdist_image_point[..., 1] / focusdist_image_point[..., 2],
        ],
        -1,
    )
    sensor_position = sensor_position / (
        (cfg.sensor_width * 0.5) / -cfg.effective_focal_length
    )

    if cfg.abb_distortion > 0.0:
        sensor_position = aberrations.inverse_barrel_distortion(
            sensor_position, cfg.abb_distortion
        )

    aspect = rc.xres / rc.yres
    s_x = sensor_position[..., 0]
    s_y = sensor_position[..., 1] * aspect
    pixel_x = ((s_x + 1.0) / 2.0) * rc.xres
    pixel_y = ((-s_y + 1.0) / 2.0) * rc.yres
    return {
        "pixel_x": pixel_x,
        "pixel_y": pixel_y,
        "lens_cs": lens,
        "rgb_weight": rgb_weight,
        "ov_ok": ov_ok,
    }


def splat_frame(cfg: CameraConfig, rc: RenderConfig, scene, stream,
                cam_to_world, po_lens=None, po_state=None, bokeh_cdf=None,
                aovs=None, n_crypto_ids: int = 0, cam_to_world_end=None,
                use_pallas: bool = True):
    """Full filter stage: gates + backward splats + buffer accumulation.

    Every AOV in ``aovs`` (default :data:`pota_tpu.render.aov.DEFAULT_AOVS`)
    rides the same splat lanes; gaussian-class AOVs accumulate
    value*weight, closest-class AOVs are winner-take by depth.  Returns the
    framebuffer dict consumed by :func:`resolve_imager` (one [H, W, 4]
    buffer per AOV + the RGBA filter-weight plane).
    """
    from .aov import CLOSEST, DEFAULT_AOVS, GAUSSIAN, aov_value_rgba

    if aovs is None:
        aovs = DEFAULT_AOVS
    n = stream["rgba"].shape[0]
    k = cfg.max_bidir_samples
    inv_density = 1.0 / rc.spp

    # per-sample camera matrices over the shutter (motion blur,
    # ref src/lentil_filter.cpp:141-150)
    if cam_to_world_end is not None:
        from .renderer import interp_camera_matrix

        c2w_s = interp_camera_matrix(
            cam_to_world, cam_to_world_end, stream["time"]
        )  # [N, 4, 4]
        w2c_rot = jnp.swapaxes(c2w_s[:, :3, :3], 1, 2)
        w2c_trans = -jnp.einsum("nij,nj->ni", w2c_rot, c2w_s[:, :3, 3],
                                precision=jax.lax.Precision.HIGHEST)
        p_cam = (
            jnp.einsum("nij,nj->ni", w2c_rot, stream["P"],
                       precision=jax.lax.Precision.HIGHEST) + w2c_trans
        )
    else:
        w2c = world_to_camera(cam_to_world)
        p_cam = jnp.matmul(stream["P"], w2c[:3, :3].T,
                           precision=jax.lax.Precision.HIGHEST) + w2c[:3, 3]
    p_cam = p_cam * cfg.unit_scale_filter

    # skydome position synthesis (ref src/lentil_filter.cpp:119-133)
    sky = (stream["z"] >= 1e29) | (
        jnp.linalg.norm(stream["P"], axis=-1) < 1e-7
    )
    if cfg.enable_skydome:
        synth_ws = stream["raydir"] * 99999999.0
        p_ws = jnp.where(sky[:, None], synth_ws, stream["P"])
        if cam_to_world_end is not None:
            p_cam_sky = (
                jnp.einsum("nij,nj->ni", w2c_rot, p_ws,
                           precision=jax.lax.Precision.HIGHEST) + w2c_trans
            ) * cfg.unit_scale_filter
        else:
            p_cam_sky = (
                jnp.matmul(p_ws, w2c[:3, :3].T,
                           precision=jax.lax.Precision.HIGHEST) + w2c[:3, 3]
            ) * cfg.unit_scale_filter
        p_cam = jnp.where(sky[:, None], p_cam_sky, p_cam)
    else:
        p_ws = stream["P"]

    redistribute, budget, coc, _ = compute_gates_and_budget(
        cfg, rc, stream, p_cam, po_lens=po_lens, po_state=po_state
    )

    # additional energy with soft transition (ref src/lentil.h:1128-1138)
    lum = _luminance(stream["rgba"])
    if cfg.bidir_add_energy > 0.0:
        lo = cfg.bidir_add_energy_minimum_luminance
        tr = cfg.bidir_add_energy_transition
        perc = jnp.clip((lum - lo) / tr, 0.0, 1.0)
        add_energy = cfg.bidir_add_energy * perc
    else:
        add_energy = jnp.zeros_like(lum)

    # ---- backward splats: [N, K] lanes ---------------------------------
    seeds = (
        stream["px"].astype(jnp.uint32) * stream["py"].astype(jnp.uint32)
        + stream["px"].astype(jnp.uint32)
    )
    k_idx = jnp.broadcast_to(jnp.arange(k, dtype=jnp.uint32)[None, :], (n, k))
    # Gated-out samples (sky with P=0, inside-lens, ...) can hold degenerate
    # positions that produce NaN/Inf inside the projections.  Their lanes
    # are masked below, but NaN x 0 still poisons gradients and Newton
    # solves, so substitute a benign position first.
    p_cam_safe = jnp.where(
        redistribute[:, None], p_cam,
        jnp.asarray([0.0, 0.0, -100.0], p_cam.dtype),
    )
    if cfg.camera_type == CameraType.POLYNOMIAL_OPTICS:
        proj = po_backward_project(
            cfg, rc, po_lens, po_state, p_cam_safe, seeds[:, None], k_idx,
            bokeh_cdf=bokeh_cdf, use_pallas=use_pallas,
        )
    else:
        proj = thinlens_backward_project(
            cfg, rc, p_cam_safe[:, None, :], seeds[:, None], k_idx,
            bokeh_cdf=bokeh_cdf,
        )
    if not cfg.differentiate_splat_geometry:
        proj = jax.tree_util.tree_map(jax.lax.stop_gradient, proj)

    # occlusion probe in world space (ref AiTraceProbe, filter.cpp:355-375)
    lens_ws_scale = 1.0 / cfg.unit_scale_filter
    lens_cs = proj["lens_cs"] * lens_ws_scale
    if cam_to_world_end is not None:
        cam_pos_ws = (
            jnp.einsum("nij,nkj->nki", c2w_s[:, :3, :3], lens_cs,
                       precision=jax.lax.Precision.HIGHEST)
            + c2w_s[:, None, :3, 3]
        )
    else:
        cam_pos_ws = (
            jnp.matmul(lens_cs, cam_to_world[:3, :3].T,
                       precision=jax.lax.Precision.HIGHEST) + cam_to_world[:3, 3]
        )
    occluded = scene.occluded(
        jnp.broadcast_to(p_ws[:, None, :], (n, k, 3)).reshape(-1, 3),
        cam_pos_ws.reshape(-1, 3),
    ).reshape(n, k)
    occluded = occluded & ~sky[:, None]

    in_bounds = (
        (proj["pixel_x"] >= 0)
        & (proj["pixel_x"] < rc.xres)
        & (proj["pixel_y"] >= 0)
        & (proj["pixel_y"] < rc.yres)
        & jnp.isfinite(proj["pixel_x"])
        & jnp.isfinite(proj["pixel_y"])
    )
    lane_active = k_idx < jnp.minimum(budget, k)[:, None]
    valid = (
        lane_active & in_bounds & proj["ov_ok"] & ~occluded
        & redistribute[:, None]
    )

    successes = valid.sum(-1)
    inv_success = jnp.where(successes > 0, 1.0 / successes, 0.0)

    # fall back to the source pixel when no lane succeeded
    use_source = (~redistribute) | (successes == 0)

    px_splat = jnp.clip(
        jnp.floor(proj["pixel_x"]).astype(jnp.int32), 0, rc.xres - 1
    )
    py_splat = jnp.clip(
        jnp.floor(proj["pixel_y"]).astype(jnp.int32), 0, rc.yres - 1
    )
    lin_splat = py_splat * rc.xres + px_splat
    lin_source = stream["py"] * rc.xres + stream["px"]

    # weight chain (ref src/lentil_filter.cpp:295-298, 442-444)
    w_lane = jnp.where(valid, inv_density * inv_success[:, None], 0.0)
    rgbw = jnp.concatenate(
        [proj["rgb_weight"], jnp.ones_like(proj["rgb_weight"][..., :1])], -1
    )
    w_src = jnp.where(use_source, inv_density, 0.0)

    npix = rc.xres * rc.yres
    nk = n * k
    dtype = stream["rgba"].dtype

    # ---- writers: all splat lanes + the source-pixel fallback path -------
    writer_pix = jnp.concatenate([lin_splat.reshape(-1), lin_source])
    writer_valid = jnp.concatenate([valid.reshape(-1), use_source])
    depth_src = jnp.abs(stream["z"])
    writer_depth = jnp.concatenate(
        [jnp.broadcast_to(depth_src[:, None], (n, k)).reshape(-1), depth_src]
    )

    # per-sample AOV stream values (debug AOV = backward budget,
    # ref src/lentil_filter.cpp:209-211)
    stream = {
        **stream,
        "debug": jnp.where(redistribute, budget, 0).astype(dtype),
        "time": stream.get("time", jnp.zeros_like(depth_src)),
    }

    # deterministic closest-filter winner per pixel: smallest depth, ties
    # broken by writer id (replaces the reference's tolerated write races,
    # ref src/lentil.h:832-845)
    big = jnp.asarray(3e38, dtype)
    zmin_buf = jnp.full((npix,), big, dtype)
    zmin_buf = zmin_buf.at[writer_pix].min(
        jnp.where(writer_valid, writer_depth, big)
    )
    is_min = writer_valid & (writer_depth <= zmin_buf[writer_pix])
    wid = jnp.arange(nk + n, dtype=jnp.int32)
    winner_buf = jnp.full((npix,), jnp.iinfo(jnp.int32).max, jnp.int32)
    winner_buf = winner_buf.at[writer_pix].min(
        jnp.where(is_min, wid, jnp.iinfo(jnp.int32).max)
    )
    is_winner = is_min & (wid == winner_buf[writer_pix])

    buffers: dict = {}
    weight_buf = jnp.zeros((npix,), dtype)

    for spec in aovs:
        values = aov_value_rgba(stream, spec)  # [N, 4]
        lane_vals = jnp.broadcast_to(values[:, None, :], (n, k, 4))

        if spec.filter == GAUSSIAN:
            if spec.name == "RGBA":
                # additional energy rides RGBA only (ref filter.cpp:172-174)
                values = values + add_energy[:, None] * jnp.asarray(
                    [1.0, 1.0, 1.0, 0.0], dtype
                )
                lane_vals = jnp.broadcast_to(values[:, None, :], (n, k, 4))
                lane_contrib = lane_vals * rgbw * w_lane[..., None]
            else:
                lane_contrib = lane_vals * w_lane[..., None]
            buf = jnp.zeros((npix, 4), dtype)
            buf = buf.at[lin_splat.reshape(-1)].add(
                lane_contrib.reshape(-1, 4)
            )
            buf = buf.at[lin_source].add(values * w_src[:, None])
            if spec.name == "RGBA":
                weight_buf = weight_buf.at[lin_splat.reshape(-1)].add(
                    w_lane.reshape(-1)
                )
                weight_buf = weight_buf.at[lin_source].add(w_src)
        else:  # CLOSEST: winner-take write by depth
            writer_vals = jnp.concatenate(
                [lane_vals.reshape(-1, 4), values], 0
            )
            if spec.name == "lentil_debug":
                # debug only records nonzero counts (ref src/lentil.h:838-843)
                nz = writer_vals[:, 0] != 0.0
                take = is_winner & nz
            else:
                take = is_winner
            buf = jnp.zeros((npix, 4), dtype)
            buf = buf.at[writer_pix].add(
                writer_vals * take[:, None].astype(dtype)
            )
        buffers[spec.name] = buf.reshape(rc.yres, rc.xres, 4)

    # ---- id-matte (cryptomatte capability, SURVEY.md C13): dense per-id
    # coverage accumulated with the same splat weight chain
    # (ref add_to_buffer_cryptomatte, src/lentil.h:814-819) ----------------
    if n_crypto_ids:
        oid = stream["obj_id"]
        id_safe = jnp.maximum(oid, 0)
        has_id = oid >= 0
        crypto = jnp.zeros((npix * n_crypto_ids,), dtype)
        lane_cidx = lin_splat * n_crypto_ids + id_safe[:, None]
        crypto = crypto.at[lane_cidx.reshape(-1)].add(
            jnp.where(has_id[:, None], w_lane, 0.0).reshape(-1)
        )
        crypto = crypto.at[lin_source * n_crypto_ids + id_safe].add(
            jnp.where(has_id, w_src, 0.0)
        )
        total = jnp.zeros((npix,), dtype)
        total = total.at[lin_splat.reshape(-1)].add(w_lane.reshape(-1))
        total = total.at[lin_source].add(w_src)
        buffers["crypto"] = crypto.reshape(rc.yres, rc.xres, n_crypto_ids)
        buffers["crypto_total"] = total.reshape(rc.yres, rc.xres)

    buffers["filter_weight"] = weight_buf.reshape(rc.yres, rc.xres)
    buffers["zmin"] = zmin_buf.reshape(rc.yres, rc.xres)
    return buffers


def resolve_crypto(fb: dict, ranks: int = 3):
    """Rank-extract id-matte layers from the dense coverage buffer.

    TPU-native version of the reference imager's crypto resolve
    (src/lentil_imager.cpp:121-160): sort ids by coverage weight, emit
    ``ranks`` RGBA layers each holding two (id, normalized-weight) pairs —
    the standard cryptomatte layer packing.
    """
    crypto = fb["crypto"]                       # [H, W, I]
    total = jnp.maximum(fb["crypto_total"], 1e-12)[..., None]
    k = min(2 * ranks, crypto.shape[-1])
    vals, ids = jax.lax.top_k(crypto, k)
    vals = vals / total
    vals = jnp.where(vals > 0, vals, 0.0)
    idf = jnp.where(vals > 0, ids.astype(crypto.dtype), 0.0)
    layers = []
    for r in range(ranks):
        i0, i1 = 2 * r, 2 * r + 1
        if i1 < k:
            layer = jnp.stack(
                [idf[..., i0], vals[..., i0], idf[..., i1], vals[..., i1]], -1
            )
        elif i0 < k:
            z = jnp.zeros_like(idf[..., i0])
            layer = jnp.stack([idf[..., i0], vals[..., i0], z, z], -1)
        else:
            z = jnp.zeros_like(crypto[..., 0])
            layer = jnp.stack([z, z, z, z], -1)
        layers.append(layer)
    return layers


def po_backward_project(cfg, rc, lens, po_state, p_cam, seeds, k_idx,
                        bokeh_cdf=None, use_pallas: bool = True):
    """Backward PO projection per (source, lane) (ref trace_ray_bw_po,
    src/lentil.h:573-661 + splat loop src/lentil_filter.cpp:248-300)."""
    from ..optics.polynomial import inner_pupil_ok, lt_sample_aperture
    from ..optics import samplers as smp

    n, k = k_idx.shape
    u = prng.uniforms(seeds, k_idx, 4)
    r1, r2 = u[..., 0], u[..., 1]

    if cfg.bokeh_enable_image and bokeh_cdf is not None:
        from .bokeh_image import bokeh_sample
        unit_disk = bokeh_sample(bokeh_cdf, r1, r2)
    elif cfg.aperture_blades <= 2:
        unit_disk = smp.concentric_disk_sample(r1, r2)
    else:
        unit_disk = smp.triangular_aperture_sample(
            r1, r2, 1.0, cfg.aperture_blades
        )
    aperture = unit_disk * po_state.aperture_radius

    target = -p_cam[:, None, :] * 10.0  # ref src/lentil_filter.cpp:271
    target = jnp.broadcast_to(target, (n, k, 3))
    lam = jnp.full((n, k), cfg.lambda_um)

    from ..ops.po_pallas import resolve_backward_kernel

    kern = resolve_backward_kernel(
        lens, cfg.lt_newton_iterations, use_pallas=use_pallas
    )
    if kern is not None:
        # fused per-lens backward kernel (Newton solve + pt_evaluate in
        # VMEM; see ops/po_pallas.py build_po_backward_kernel)
        flat = lambda a: a.reshape(-1)
        sx_f, sy_f, sdx_f, sdy_f, trans_f = kern(
            flat(target[..., 0]), flat(target[..., 1]),
            flat(target[..., 2]), flat(aperture[..., 0]),
            flat(aperture[..., 1]), flat(lam),
        )
        sensor5 = jnp.stack(
            [sx_f, sy_f, sdx_f, sdy_f, flat(lam)], -1
        ).reshape(n, k, 5)
        trans = trans_f.reshape(n, k)
    else:
        sensor5, out4, trans = lt_sample_aperture(
            lens, target, aperture, lam, iterations=cfg.lt_newton_iterations
        )
    ok = (trans > 0.0) & inner_pupil_ok(lens, sensor5)

    # sensor shift compensation (ref src/lentil.h:653-655)
    sx = sensor5[..., 0] + sensor5[..., 2] * -po_state.sensor_shift
    sy = sensor5[..., 1] + sensor5[..., 3] * -po_state.sensor_shift

    aspect = rc.xres / rc.yres
    s_x = sx / (cfg.sensor_width * 0.5)
    s_y = sy / (cfg.sensor_width * 0.5) * aspect
    pixel_x = ((s_x + 1.0) / 2.0) * rc.xres
    pixel_y = ((-s_y + 1.0) / 2.0) * rc.yres

    # lens point for the occlusion probe, in camera units
    # (ref src/lentil.h:613-619: -aperture*0.1 then per-unit rescale; for cm
    # that is -aperture * 0.1)
    lens_cs = jnp.concatenate(
        [-aperture * 0.1, jnp.zeros_like(aperture[..., :1])], -1
    ) * (cfg.unit_scale_filter / 1.0)

    return {
        "pixel_x": pixel_x,
        "pixel_y": pixel_y,
        "lens_cs": lens_cs,
        "rgb_weight": jnp.ones((n, k, 3)),
        "ov_ok": ok,
    }


def resolve_imager(rc: RenderConfig, fb: dict) -> jnp.ndarray:
    """Imager resolve of the beauty pass: normalize RGBA by the accumulated
    filter weight (ref src/lentil_imager.cpp:169-179)."""
    w = fb["filter_weight"]
    return fb["RGBA"] / jnp.maximum(w, 1e-12)[..., None]


def resolve_aovs(rc: RenderConfig, fb: dict, aovs=None) -> dict:
    """Resolve every AOV plane: gaussian-class divide by the RGBA filter
    weight (exactly like the reference imager, which normalizes all
    gaussian AOVs by the shared weight buffer); closest-class pass through
    raw (ref src/lentil_imager.cpp:164-186)."""
    from .aov import DEFAULT_AOVS, GAUSSIAN

    if aovs is None:
        aovs = DEFAULT_AOVS
    w = jnp.maximum(fb["filter_weight"], 1e-12)[..., None]
    out = {}
    for spec in aovs:
        buf = fb[spec.name]
        if spec.filter == GAUSSIAN and spec.name != "lentil_debug":
            out[spec.name] = buf / w
        else:
            out[spec.name] = buf
    return out
