"""Benchmark: polynomial-optics forward rays/s at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md): the baseline
constant below is our documented estimate of the reference's CPU camera
throughput — its deprecated ray-traced camera's ns/ray harness and the
generated-polynomial cost (~0.5 us/ray incl. aperture solve + retries on a
workstation core, ~16 threads) puts the plugin's ceiling around 2e6
camera rays/s.  vs_baseline = measured / that estimate.
"""
from __future__ import annotations

import json
import time

BASELINE_RAYS_PER_S = 2.0e6


def main():
    import jax
    import jax.numpy as jnp

    from pota_tpu import CameraConfig, CameraType, RenderConfig
    from pota_tpu.optics.fit import get_or_fit_lens
    from pota_tpu.optics.focus import setup_po_camera
    from pota_tpu.render import sampling
    from pota_tpu.render.renderer import trace_camera_rays

    lens_name = "angenieux__double_gauss__1953__49mm"
    poly = get_or_fit_lens(lens_name)
    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS,
        lens_model=lens_name,
        fstop=2.8,
        focus_distance=150.0,
        vignetting_retries=3,
    )
    state = setup_po_camera(poly, cfg)
    rc = RenderConfig(xres=1920, yres=1080, spp=1)

    @jax.jit
    def forward(seed_offset):
        samples = sampling.frame_samples(rc, 0)
        # decorrelate across iterations without re-hashing the frame
        samples = {**samples, "key": samples["key"] + seed_offset}
        origin, direction, weight = trace_camera_rays(
            cfg, samples, po_lens=poly, po_state=state
        )
        return origin.sum() + direction.sum() + weight.sum()

    n_rays = rc.xres * rc.yres * rc.spp
    forward(jnp.uint32(0)).block_until_ready()  # compile

    iters = 10
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        acc = forward(jnp.uint32(i + 1))
    jax.block_until_ready(acc)
    dt = (time.perf_counter() - t0) / iters

    rays_per_s = n_rays / dt
    print(
        json.dumps(
            {
                "metric": "po_forward_rays_per_s_1080p",
                "value": rays_per_s,
                "unit": "rays/s/chip",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
