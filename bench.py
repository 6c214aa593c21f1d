"""Benchmark: all BASELINE.md configs on the current backend (one chip).

Prints ONE JSON line.  Top-level fields are the flagship metric (config #4,
bidirectional 1080p with AOVs — the reference's reason to exist,
/root/reference/src/lentil_filter.cpp:66-480); the ``configs`` list carries
every measured config:

  1. tl_teapot_256_16spp      thin-lens bidir teapot, 256x256 @ 16 spp
  2. po_forward_1080p         PO forward ray generation only, 1920x1080
  3. po_bokeh_chromatic_512   PO + image-bokeh aperture + 3-lambda chromatic
  4. po_bidir_1080p_aovs      full bidirectional lightgrid @ 1080p, all AOVs
  5. sharded_grad_step        differentiable sharded step (multi-device
                              only) + the recorded virtual-mesh scaling
                              sweep from BENCH_SCALING.json if present

Baselines: the reference publishes no numbers (BASELINE.md).  The constants
below are documented estimates of the reference's CPU plugin on a 16-thread
workstation: ~2e6 camera rays/s forward (generated-poly eval + aperture
solve + retries ~0.5 us/ray/core), and ~8e6 backward splats/s
(each backward splat = Newton lt_sample_aperture solve + occlusion probe,
~2 us/core).  vs_baseline = measured / estimate.
"""
from __future__ import annotations

import json
import os
import sys
import time

BASELINE_FW_RAYS_PER_S = 2.0e6
BASELINE_BW_SPLATS_PER_S = 8.0e6
FLAGSHIP = "angenieux__double_gauss__1953__49mm"


def _timeit(fn, *args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_tl_teapot():
    import jax

    from pota_tpu import CameraConfig, RenderConfig
    from pota_tpu.render import scene as sc
    from pota_tpu.render.renderer import look_at, render_frame

    cfg = CameraConfig(focal_length=50.0, fstop=1.4, focus_distance=150.0,
                       vignetting_retries=3, splat_queue_mult=8)
    rc = RenderConfig(xres=256, yres=256, spp=16)
    scene = sc.teapot_scene()
    m = look_at([0, 0, 0], [0, 0, -1])

    f = jax.jit(lambda seed: render_frame(cfg, rc, scene, m, seed=0)[0])
    dt = _timeit(f, 0)
    n = rc.xres * rc.yres * rc.spp
    return {
        "metric": "tl_teapot_256_16spp_samples_per_s",
        "value": n / dt,
        "unit": "AA samples/s/chip",
        "frame_ms": dt * 1e3,
        "vs_baseline": (n / dt) / BASELINE_FW_RAYS_PER_S,
    }


def bench_po_forward(poly, state, cfg):
    import jax
    import jax.numpy as jnp

    from pota_tpu import RenderConfig
    from pota_tpu.render import sampling
    from pota_tpu.render.renderer import trace_camera_rays

    rc = RenderConfig(xres=1920, yres=1080, spp=1)

    @jax.jit
    def forward(seed_offset):
        samples = sampling.frame_samples(rc, 0)
        samples = {**samples, "key": samples["key"] + seed_offset}
        origin, direction, weight = trace_camera_rays(
            cfg, samples, po_lens=poly, po_state=state
        )
        return origin.sum() + direction.sum() + weight.sum()

    dt = _timeit(forward, jnp.uint32(1), iters=10)
    n = rc.xres * rc.yres * rc.spp
    return {
        "metric": "po_forward_rays_per_s_1080p",
        "value": n / dt,
        "unit": "rays/s/chip",
        "frame_ms": dt * 1e3,
        "vs_baseline": (n / dt) / BASELINE_FW_RAYS_PER_S,
    }


def bench_po_bokeh_chromatic(poly):
    import dataclasses as dc

    import jax
    import numpy as np

    from pota_tpu import CameraConfig, CameraType, RenderConfig
    from pota_tpu.optics.focus import setup_po_camera
    from pota_tpu.render import scene as sc
    from pota_tpu.render.bokeh_image import build_bokeh_cdf
    from pota_tpu.render.renderer import look_at, render_frame

    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
        fstop=2.8, focus_distance=20.0, vignetting_retries=3,
        abb_chromatic=0.6, bokeh_enable_image=True, splat_queue_mult=8,
    )
    state = setup_po_camera(poly, cfg)
    rc = RenderConfig(xres=512, yres=512, spp=2)
    n = 32
    yy, xx = np.mgrid[0:n, 0:n]
    r = np.sqrt((xx - (n - 1) / 2) ** 2 + (yy - (n - 1) / 2) ** 2) / (n / 2)
    ring = ((r > 0.5) & (r < 0.95)).astype(np.float32)
    cdf = build_bokeh_cdf(np.stack([ring] * 3, -1))
    scene = sc.lightgrid_scene(n=4, spacing=14.0, z=-150.0, radius=0.8,
                               intensity=40.0)
    m = look_at([0, 0, 0], [0, 0, -1])

    f = jax.jit(
        lambda _: render_frame(cfg, rc, scene, m, seed=0, po_lens=poly,
                               po_state=state, bokeh_cdf=cdf)[0]
    )
    dt = _timeit(f, 0, iters=3)
    n_samp = rc.xres * rc.yres * rc.spp
    return {
        "metric": "po_bokeh_chromatic3_512_samples_per_s",
        "value": n_samp / dt,
        "unit": "AA samples/s/chip",
        "frame_ms": dt * 1e3,
        "vs_baseline": (n_samp / dt) / BASELINE_FW_RAYS_PER_S,
    }


def bench_po_bidir_1080p(poly):
    """Flagship: full bidirectional redistribution @1080p with all AOVs.

    Also reports the forward/splat stage split (the kernel-vs-e2e
    breakdown): the splat stage runs the fused backward Pallas kernel on
    TPU (ops/po_pallas.py build_po_backward_kernel).
    """
    import jax

    from pota_tpu import CameraConfig, CameraType, RenderConfig
    from pota_tpu.optics.focus import setup_po_camera
    from pota_tpu.render import scene as sc
    from pota_tpu.render.renderer import (
        look_at, render_frame, render_sample_stream,
    )
    from pota_tpu.render.splat import resolve_aovs, splat_frame

    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
        fstop=2.8, focus_distance=20.0, vignetting_retries=3,
        splat_queue_mult=8, splat_chunks=16,
    )
    state = setup_po_camera(poly, cfg)
    rc = RenderConfig(xres=1920, yres=1080, spp=1)
    scene = sc.lightgrid_scene(n=5, spacing=12.0, z=-150.0, radius=0.8,
                               intensity=40.0)
    m = look_at([0, 0, 0], [0, 0, -1])

    def _e2e(_):
        img, fb = render_frame(cfg, rc, scene, m, seed=0, po_lens=poly,
                               po_state=state)
        return img, resolve_aovs(rc, fb)

    f = jax.jit(_e2e)
    dt = _timeit(f, 0, iters=3)

    # stage split: forward trace+shade vs splat+resolve
    fwd = jax.jit(
        lambda _: render_sample_stream(cfg, rc, scene, m, 0, po_lens=poly,
                                       po_state=state)
    )
    dt_fwd = _timeit(fwd, 0, iters=3)
    stream = jax.block_until_ready(fwd(0))
    # resolve EVERY AOV plane (not just the beauty) so the closest-class
    # winner machinery is part of the measured graph, not dead code
    spl = jax.jit(
        lambda s: resolve_aovs(
            rc, splat_frame(cfg, rc, scene, s, m, po_lens=poly,
                            po_state=state)
        )
    )
    dt_splat = _timeit(spl, stream, iters=3)

    n_samples = rc.xres * rc.yres * rc.spp
    n_slots = cfg.splat_queue_mult * n_samples
    return {
        "metric": "po_bidir_1080p_aovs_splats_per_s",
        "value": n_slots / dt_splat,
        "unit": "backward splats/s/chip",
        "frame_ms": dt * 1e3,
        "forward_ms": dt_fwd * 1e3,
        "splat_resolve_ms": dt_splat * 1e3,
        "aa_samples_per_s": n_samples / dt,
        "vs_baseline": (n_slots / dt_splat) / BASELINE_BW_SPLATS_PER_S,
    }


def bench_sharded():
    """Config #5: only measurable with >= 2 devices on this backend; the
    virtual-CPU-mesh scaling sweep is recorded offline in
    BENCH_SCALING.json (scripts/bench_scaling.py) and echoed here."""
    import jax

    entry = {"metric": "sharded_grad_step", "devices": len(jax.devices())}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SCALING.json")
    if os.path.exists(path):
        with open(path) as f:
            entry["virtual_mesh_scaling"] = json.load(f)
    if len(jax.devices()) >= 2:
        import jax.numpy as jnp

        from pota_tpu import RenderConfig
        from pota_tpu.parallel.sharded import make_mesh, render_frame_sharded
        from pota_tpu.render import scene as sc
        from pota_tpu.render.renderer import look_at
        from pota_tpu import CameraConfig

        cfg = CameraConfig(focal_length=50.0, fstop=1.4,
                           focus_distance=150.0, vignetting_retries=1,
                           splat_queue_mult=8)
        rc = RenderConfig(xres=512, yres=512, spp=2)
        scene = sc.lightgrid_scene(n=4, spacing=14.0, z=-400.0)
        m = look_at([0, 0, 0], [0, 0, -1])
        mesh = make_mesh()
        f = lambda _: render_frame_sharded(cfg, rc, scene, m, mesh, seed=0)[0]
        dt = _timeit(f, 0, iters=3)
        entry["value"] = rc.xres * rc.yres * rc.spp / dt
        entry["unit"] = "AA samples/s/mesh"
    return entry


def main():
    from pota_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pota_tpu import CameraConfig, CameraType
    from pota_tpu.optics.fit import get_or_fit_lens
    from pota_tpu.optics.focus import setup_po_camera

    poly = get_or_fit_lens(FLAGSHIP)
    cfg_fw = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
        fstop=2.8, focus_distance=150.0, vignetting_retries=3,
    )
    state_fw = setup_po_camera(poly, cfg_fw)

    only = set(sys.argv[1:])
    configs = []

    def run(name, fn, *args):
        if only and name not in only:
            return None
        try:
            r = fn(*args)
            configs.append(r)
            if "value" in r:
                print(f"[bench] {r['metric']}: {r['value']:.4g} {r['unit']}",
                      file=sys.stderr, flush=True)
            else:
                print(f"[bench] {r['metric']}: recorded", file=sys.stderr,
                      flush=True)
            return r
        except Exception as e:  # record the failure, keep benching
            configs.append({"metric": name, "error": repr(e)})
            print(f"[bench] {name} FAILED: {e!r}", file=sys.stderr, flush=True)
            return None

    run("tl_teapot", bench_tl_teapot)
    fw = run("po_forward", bench_po_forward, poly, state_fw, cfg_fw)
    run("po_bokeh_chromatic", bench_po_bokeh_chromatic, poly)
    bidir = run("po_bidir", bench_po_bidir_1080p, poly)
    run("sharded", bench_sharded)

    headline = bidir or fw or (configs[0] if configs else
                               {"metric": "none", "value": 0.0})
    line = {
        "metric": headline["metric"],
        "value": headline.get("value", 0.0),
        "unit": headline.get("unit", ""),
        "vs_baseline": headline.get("vs_baseline", 0.0),
        "configs": configs,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
