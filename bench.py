"""Benchmark: all BASELINE.md configs on the current backend (one chip).

Prints ONE JSON line.  Top-level fields are the flagship metric (config #4,
bidirectional 1080p with AOVs — the reference's reason to exist,
/root/reference/src/lentil_filter.cpp:66-480); the ``configs`` list carries
every measured config:

  1. tl_teapot_256_16spp      thin-lens bidir teapot, 256x256 @ 16 spp
  2. po_forward_1080p         PO forward ray generation only, 1920x1080
  3. po_bokeh_chromatic_512   PO + image-bokeh aperture + 3-lambda chromatic
  4. po_bidir_1080p_aovs      full bidirectional lightgrid @ 1080p, all AOVs
  5. grad_step_4k             differentiable step on the real chip (full
                              AOVs, differentiate_splat_geometry=True) +
                              the recorded virtual-mesh scaling sweep

Baselines (the reference publishes no numbers — BASELINE.md): documented
estimates of the reference CPU plugin on a 16-thread workstation, per
primitive:

  thin-lens forward ray   ~1e7 /s   (closed-form projection + retries)
  PO forward ray          ~2e6 /s   (generated-poly eval + aperture solve)
  PO backward splat       ~8e6 /s   (Newton lt solve + occlusion probe)
  thin-lens backward splat ~1e7 /s  (closed form + occlusion probe)

Each config's ``vs_baseline`` compares in MATCHING units: configs measured
in AA samples/s derive their baseline from the per-sample work mix
(1 forward ray + splat_queue_mult backward splats per sample); config #4's
headline counts VALID splats only (dead queue slots are not work done).
"""
from __future__ import annotations

import json
import os
import sys
import time

T_FW_TL = 1.0e-7      # s per thin-lens forward ray (baseline estimate)
T_FW_PO = 5.0e-7      # s per PO forward ray
T_BW_PO = 1.25e-7     # s per PO backward splat (8e6/s)
T_BW_TL = 1.0e-7      # s per thin-lens backward splat (1e7/s)
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
    # baseline: 1 thin-lens forward ray + queue_mult backward splats/sample
    base = 1.0 / (T_FW_TL + cfg.splat_queue_mult * T_BW_TL)
    return {
        "metric": "tl_teapot_256_16spp_samples_per_s",
        "value": n / dt,
        "unit": "AA samples/s/chip",
        "frame_ms": dt * 1e3,
        "baseline": base,
        "vs_baseline": (n / dt) / base,
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
        "baseline": BASELINE_FW_RAYS_PER_S,
        "vs_baseline": (n / dt) / BASELINE_FW_RAYS_PER_S,
    }


def bench_po_bokeh_chromatic(poly):
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
        splat_chunks=4,
    )
    scene = sc.lightgrid_scene(n=4, spacing=14.0, z=-150.0, radius=0.8,
                               intensity=40.0)
    state = setup_po_camera(poly, cfg, scene=scene)
    rc = RenderConfig(xres=512, yres=512, spp=2)
    # BASELINE config 3 names the reference's shipped aperture texture
    # (bokeh_imgs/example_bokeh_kernel.tx); use the jpg original when the
    # reference tree is mounted, else a procedural ring
    ref_jpg = "/root/reference/bokeh_imgs/example_bokeh_kernel.jpg"
    if os.path.exists(ref_jpg):
        from pota_tpu.render.bokeh_image import load_bokeh_image

        cdf = load_bokeh_image(ref_jpg)
    else:
        n = 32
        yy, xx = np.mgrid[0:n, 0:n]
        r = np.sqrt(
            (xx - (n - 1) / 2) ** 2 + (yy - (n - 1) / 2) ** 2) / (n / 2)
        ring = ((r > 0.5) & (r < 0.95)).astype(np.float32)
        cdf = build_bokeh_cdf(np.stack([ring] * 3, -1))
    m = look_at([0, 0, 0], [0, 0, -1])

    f = jax.jit(
        lambda _: render_frame(cfg, rc, scene, m, seed=0, po_lens=poly,
                               po_state=state, bokeh_cdf=cdf)[0]
    )
    dt = _timeit(f, 0, iters=3)
    n_samp = rc.xres * rc.yres * rc.spp
    # per sample: 1 PO forward ray + queue_mult backward (chromatic) splats
    base = 1.0 / (T_FW_PO + cfg.splat_queue_mult * T_BW_PO)
    return {
        "metric": "po_bokeh_chromatic3_512_samples_per_s",
        "value": n_samp / dt,
        "unit": "AA samples/s/chip",
        "frame_ms": dt * 1e3,
        "baseline": base,
        "vs_baseline": (n_samp / dt) / base,
    }


def bench_po_bidir_1080p(poly):
    """Flagship: full bidirectional redistribution @1080p with all AOVs.

    Headline counts VALID backward splats/s (the queue's valid mask sum —
    dead slots are not work done); also reports issued-slot throughput and
    the stage split (queue / fused project+occlude / accumulate+resolve;
    the fused Pallas splat kernel and the sorted one-hot accumulator are
    the round-4 hot-path kernels, ops/po_pallas.py + ops/splat_accum.py).
    """
    import jax
    import jax.numpy as jnp

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
    scene = sc.lightgrid_scene(n=5, spacing=12.0, z=-150.0, radius=0.8,
                               intensity=40.0)
    state = setup_po_camera(poly, cfg, scene=scene)
    rc = RenderConfig(xres=1920, yres=1080, spp=1)
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
    # resolve EVERY AOV plane (not just the beauty) so the closest-winner
    # machinery is part of the measured graph, not dead code
    def _splat(s):
        fb = splat_frame(cfg, rc, scene, s, m, po_lens=poly,
                         po_state=state, with_diagnostics=True)
        return resolve_aovs(rc, fb), fb["_n_valid_splats"], fb["_n_issued_slots"]

    spl = jax.jit(_splat)
    dt_splat = _timeit(spl, stream, iters=3)
    _, n_valid, n_issued = jax.block_until_ready(spl(stream))
    n_valid = int(n_valid)
    n_issued = int(n_issued)

    n_samples = rc.xres * rc.yres * rc.spp
    valid_per_s = n_valid / dt_splat
    return {
        "metric": "po_bidir_1080p_aovs_valid_splats_per_s",
        "value": valid_per_s,
        "unit": "valid backward splats/s/chip",
        "frame_ms": dt * 1e3,
        "forward_ms": dt_fwd * 1e3,
        "splat_resolve_ms": dt_splat * 1e3,
        "n_valid_splats": n_valid,
        "n_issued_slots": n_issued,
        "issued_splats_per_s": n_issued / dt_splat,
        "aa_samples_per_s": n_samples / dt,
        "baseline": BASELINE_BW_SPLATS_PER_S,
        "vs_baseline": valid_per_s / BASELINE_BW_SPLATS_PER_S,
    }


def bench_grad_step(poly):
    """Config #5 on the real chip: full differentiable pipeline — 4K frame,
    lens-coefficient gradients, full AOVs, differentiate_splat_geometry on.
    Falls back to 1080p if the 4K graph does not fit HBM."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from pota_tpu import CameraConfig, CameraType, RenderConfig
    from pota_tpu.optics.focus import setup_po_camera
    from pota_tpu.render import scene as sc
    from pota_tpu.render.renderer import look_at, render_frame

    # the SHADED scene: pure-emissive grids make the loss piecewise-
    # constant in the lens coefficients (grad identically 0); the teapot's
    # lambert term gives the continuous hit-point dependence a lens-
    # optimization objective actually has
    scene = sc.teapot_scene()
    m = look_at([0, 0, 0], [0, 0, -1])

    def run(xres, yres, queue_mult, chunks):
        cfg = CameraConfig(
            camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
            fstop=2.8, focus_distance=20.0, vignetting_retries=2,
            splat_queue_mult=queue_mult, splat_chunks=chunks,
            trace_chunks=chunks, differentiate_splat_geometry=True,
        )
        state = setup_po_camera(poly, cfg, scene=scene)
        rc = RenderConfig(xres=xres, yres=yres, spp=1)

        def loss_fn(coeffs):
            poly2 = dc.replace(poly, pt=dc.replace(poly.pt, coeffs=coeffs))
            # differentiable=True: splat geometry runs through the fused
            # kernels behind stop_gradient — its a.e. cotangent is exactly
            # zero (floor'd pixel targets, boolean validity), so this is
            # the TRUE gradient at a fraction of the pure-path primal cost
            # (r5 grad profile: the pure splat primal was ~4.6 s of the
            # 5.5 s step while its coefficient-gradient DCE'd to 29 ms)
            img, _ = render_frame(cfg, rc, scene, m, seed=0, po_lens=poly2,
                                  po_state=state, use_pallas=False,
                                  differentiable=True)
            return jnp.mean(img[..., :3])

        g = jax.jit(jax.grad(loss_fn))
        dt = _timeit(g, poly.pt.coeffs, iters=2)
        gval = jax.block_until_ready(g(poly.pt.coeffs))
        gnorm = float(jnp.linalg.norm(gval))
        return dt, gnorm

    try:
        dt, gnorm = run(3840, 2160, 4, 32)
        res = "3840x2160"
    except Exception as e:  # HBM-bound: drop to 1080p, chunked
        print(f"[bench] grad_step 4K failed ({type(e).__name__}); "
              "falling back to 1080p", file=sys.stderr, flush=True)
        dt, gnorm = run(1920, 1080, 4, 16)
        res = "1920x1080"

    entry = {
        "metric": "grad_step_4k",
        "value": dt,
        "unit": f"s/step ({res}, lens-coefficient grads, "
                "differentiate_splat_geometry=True)",
        "resolution": res,
        "grad_norm": gnorm,
        "steps_per_s": 1.0 / dt,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SCALING.json")
    if os.path.exists(path):
        with open(path) as f:
            entry["virtual_mesh_scaling"] = json.load(f)
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
    run("grad_step", bench_grad_step, poly)

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
