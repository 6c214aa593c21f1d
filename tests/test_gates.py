"""Filter gate chain + splat budget/queue (ref src/lentil_filter.cpp:105-240).

Each gate the reference evaluates per sample is flipped in isolation here:
volume, transmitted-energy (with and without enable_bidir_transmission),
lentil_ignore, adaptive-density, the CoC threshold, and the AA gate.  Plus
the budget contract: [4, 2000] clamping and the flat splat queue granting
big-CoC highlights far more than 64 slots.
"""
import dataclasses as dc

import numpy as np
import jax.numpy as jnp
import pytest

from pota_tpu import CameraConfig, RenderConfig
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_frame
from pota_tpu.render.splat import compute_gates_and_budget, splat_queue

CFG = CameraConfig(focal_length=65.0, fstop=1.8, focus_distance=150.0)
RC = RenderConfig(xres=48, yres=48, spp=4)
M = look_at([0, 0, 0], [0, 0, -1])


def _stream(n=4, z=-400.0, lum=30.0, **extra):
    """Bright out-of-focus samples that pass every gate by default."""
    base = {
        "z": jnp.full((n,), -z if z > 0 else -z),  # positive ray distance
        "P": jnp.tile(jnp.asarray([[0.0, 0.0, z]]), (n, 1)),
        "rgba": jnp.tile(jnp.asarray([[lum, lum, lum, 1.0]]), (n, 1)),
        "raydir": jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1)),
    }
    base.update(extra)
    return base


def _gates(cfg=CFG, rc=RC, **extra):
    stream = _stream(**extra)
    p_cam = stream["P"]  # camera at origin looking down -z
    return compute_gates_and_budget(cfg, rc, stream, p_cam)


def test_baseline_redistributes():
    redis, budget, coc, _ = _gates()
    assert bool(redis.all())
    assert int(budget.min()) >= 4


def test_volume_gate():
    vol = jnp.zeros((4, 3)).at[1].set(0.5)
    redis, *_ = _gates(volume=vol)
    np.testing.assert_array_equal(np.asarray(redis), [True, False, True, True])


def test_transmission_gate_and_energy_subtraction():
    # sample 1 carries transmitted energy: gated off, and the budget-driving
    # luminance drops by the transmitted part (ref src/lentil_filter.cpp:152-159)
    tr = jnp.zeros((4, 3)).at[1].set(29.0)
    redis, budget, *_ = _gates(transmission=tr)
    redis0, budget0, *_ = _gates()
    np.testing.assert_array_equal(np.asarray(redis), [True, False, True, True])
    assert int(budget[1]) < int(budget0[1])

    # with enable_bidir_transmission the gate is open
    cfg_t = dc.replace(CFG, enable_bidir_transmission=True)
    redis_t, *_ = _gates(cfg=cfg_t, transmission=tr)
    assert bool(redis_t.all())


def test_lentil_ignore_gate():
    ig = jnp.zeros((4,)).at[2].set(1.0)
    redis, *_ = _gates(lentil_ignore=ig)
    np.testing.assert_array_equal(np.asarray(redis), [True, True, False, True])


def test_adaptive_density_gate():
    # per-sample inv_density > 0.2 disables redistribution (ref :108-113)
    inv = jnp.asarray([0.1, 0.5, 0.05, 1.0])
    redis, *_ = _gates(inv_density=inv)
    np.testing.assert_array_equal(np.asarray(redis), [True, False, True, False])


def test_aa_gate():
    # static-spp analog: spp too low for the final AA level
    rc1 = RenderConfig(xres=48, yres=48, spp=1, enforce_aa_gate=True)
    redis, *_ = _gates(rc=rc1)
    assert not bool(redis.any())
    rc2 = RenderConfig(xres=48, yres=48, spp=1, enforce_aa_gate=False)
    redis2, *_ = _gates(rc=rc2)
    assert bool(redis2.all())


def test_coc_threshold_gate():
    # a sample at the focus plane has CoC ~ 0 < 0.4 -> no redistribution
    redis, _, coc, _ = _gates(z=-150.0)
    assert float(coc.max()) < 0.4
    assert not bool(redis.any())


def test_budget_clamps_to_reference_range():
    rc_big = RenderConfig(xres=256, yres=256, spp=1)
    _, budget, *_ = _gates(rc=rc_big)                 # bright, huge CoC
    assert int(budget.max()) == 2000                  # ref clamp top
    _, budget_dim, *_ = _gates(rc=rc_big, lum=1e-4)   # dim sample
    assert int(budget_dim.min()) == 4                 # ref clamp bottom


def test_queue_grants_big_coc_more_than_64_slots():
    budget = jnp.asarray([2000, 4, 4, 4], jnp.int32)
    redis = jnp.asarray([True, True, True, True])
    src, lane, slot_on, slots = splat_queue(budget, redis, 1, 4096)
    slots = np.asarray(slots)
    assert slots[0] == 2000            # far beyond the old 64-lane cap
    assert slots[1:].tolist() == [4, 4, 4]
    # slot->source mapping is contiguous and complete
    src = np.asarray(src)[np.asarray(slot_on)]
    assert (src == 0).sum() == 2000 and (src == 1).sum() == 4


def test_queue_overflow_rescales_proportionally():
    budget = jnp.asarray([2000, 1000], jnp.int32)
    redis = jnp.asarray([True, True])
    _, _, slot_on, slots = splat_queue(budget, redis, 1, 300)
    slots = np.asarray(slots)
    assert slots.sum() <= 300
    assert abs(slots[0] / max(slots[1], 1) - 2.0) < 0.1  # keeps the ratio


def test_queue_overflow_never_zeroes_a_dim_sample():
    """The global rescale must not silently un-redistribute dim samples:
    every redistributed source keeps >= 1 budget unit (the reference's
    overshoot cap shrinks budgets but never zeroes one,
    ref src/lentil_filter.cpp:197-202)."""
    budget = jnp.asarray([2000, 4, 4], jnp.int32)
    redis = jnp.asarray([True, True, True])
    # scale = 500/2008 ~ 0.249 -> floor(4 * 0.249) = 0 without the clamp
    src, lane, slot_on, slots = splat_queue(budget, redis, 1, 500)
    slots = np.asarray(slots)
    assert (slots[1:] >= 1).all(), slots
    # chromatic: the minimum grant is one full 3-lambda triple
    _, _, _, slots3 = splat_queue(budget, redis, 3, 1500)
    slots3 = np.asarray(slots3)
    assert (slots3[1:] >= 3).all(), slots3
    # gated-out samples still get nothing
    redis_off = jnp.asarray([True, False, True])
    _, _, _, slots_off = splat_queue(budget, redis_off, 1, 500)
    assert int(np.asarray(slots_off)[1]) == 0


def test_transmission_scene_end_to_end():
    """A highlight behind thin glass only redistributes when
    enable_bidir_transmission is on (ref src/lentil_filter.cpp:152-159)."""
    base = sc.lightgrid_scene(n=1, spacing=1.0, z=-400.0, radius=3.0,
                              intensity=40.0)
    s = base.centers.shape[0]
    glass = sc.SphereScene(
        centers=jnp.concatenate(
            [base.centers, jnp.asarray([[0.0, 0.0, -300.0]])], 0
        ),
        radii=jnp.concatenate([base.radii, jnp.asarray([30.0])], 0),
        emission=jnp.concatenate([base.emission, jnp.zeros((1, 3))], 0),
        albedo=jnp.concatenate([base.albedo, jnp.zeros((1, 3))], 0),
        sky_color=base.sky_color,
        light_dir=base.light_dir,
        light_color=base.light_color,
        transmission=jnp.concatenate(
            [jnp.zeros((s, 3)), jnp.full((1, 3), 0.9)], 0
        ),
    )
    cfg_off = dc.replace(CFG, enable_bidir_transmission=False)
    cfg_on = dc.replace(CFG, enable_bidir_transmission=True)
    img_off, _ = render_frame(cfg_off, RC, glass, M, seed=0)
    img_on, _ = render_frame(cfg_on, RC, glass, M, seed=0)
    lit_off = (np.asarray(img_off)[..., :3].max(-1) > 0.02).sum()
    lit_on = (np.asarray(img_on)[..., :3].max(-1) > 0.02).sum()
    assert lit_on > lit_off * 1.5, (lit_on, lit_off)
