"""Virtual-mesh scaling sweep -> BENCH_SCALING.json.

Runs the full bidirectional sharded render on 1/2/4/8 virtual CPU devices
(``--xla_force_host_platform_device_count``) and records AA samples/s per
mesh size.  HONEST CAVEAT, recorded in the output: the virtual devices all
share this host's CPU cores, so this does NOT measure ICI scaling — it
bounds the *orchestration overhead* of the shard_map program (sample-stream
sharding + psum framebuffer merge): efficiency(n) =
throughput(n) / throughput(1) would be ~1.0 for a zero-overhead sharding.
Real multi-chip scaling needs a pod slice (BASELINE.json north star).

Each mesh size runs in a subprocess because the device count is fixed at
backend init.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from pota_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from pota_tpu import CameraConfig, RenderConfig
from pota_tpu.parallel.sharded import make_mesh, render_frame_sharded
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at

n = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else "full"
if mode == "halo":
    # near-focused config so the max-CoC halo fits inside a shard tile
    cfg = CameraConfig(focal_length=50.0, fstop=8.0, focus_distance=390.0,
                       vignetting_retries=1, splat_queue_mult=8)
else:
    cfg = CameraConfig(focal_length=50.0, fstop=1.4, focus_distance=150.0,
                       vignetting_retries=1, splat_queue_mult=8)
rc = RenderConfig(xres=128, yres=128, spp=2)
scene = sc.lightgrid_scene(n=3, spacing=22.0, z=-400.0, radius=2.0,
                           intensity=40.0)
m = look_at([0, 0, 0], [0, 0, -1])
mesh = make_mesh(n)
halo = None
extra = {{}}
if mode == "halo":
    from pota_tpu.parallel.sharded import merge_traffic_bytes, splat_halo_rows
    halo = splat_halo_rows(cfg, rc, scene)
    n_ch = 4 + 5 * 4 + 1 + 1  # DEFAULT_AOVS planes + filter_weight + zmin
    extra = {{"halo_rows": halo,
              "merge_bytes_full": merge_traffic_bytes(rc, n, n_ch, None),
              "merge_bytes_halo": merge_traffic_bytes(rc, n, n_ch, halo)}}
f = lambda: render_frame_sharded(cfg, rc, scene, m, mesh, seed=0,
                                 halo_rows=halo)[0]
jax.block_until_ready(f())  # compile
iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    out = f()
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / iters
print(json.dumps({{"n": n, "samples_per_s": rc.xres * rc.yres * rc.spp / dt,
                   "frame_ms": dt * 1e3, **extra}}))
"""


def main():
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        out = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO), str(n)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        r = json.loads(line)
        results.append(r)
        print(f"[scaling] n={n}: {r['samples_per_s']:.4g} samples/s "
              f"({r['frame_ms']:.1f} ms/frame)", flush=True)

    # halo-bounded merge at n=8: same render, boundary-band exchange only
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    halo_entry = None
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), "8", "halo"],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if out.returncode == 0 and out.stdout.strip():
        halo_entry = json.loads(out.stdout.strip().splitlines()[-1])
        red = (halo_entry["merge_bytes_full"]
               / max(halo_entry["merge_bytes_halo"], 1))
        print(f"[scaling] halo n=8: {halo_entry['samples_per_s']:.4g} "
              f"samples/s, halo={halo_entry['halo_rows']} rows, "
              f"merge traffic {red:.1f}x smaller", flush=True)
    else:
        print(f"[scaling] halo run failed: {out.stderr[-400:]}", flush=True)

    base = results[0]["samples_per_s"]
    payload = {
        "note": (
            "virtual CPU mesh on one host: all devices share the host "
            "cores, so efficiency measures shard_map orchestration overhead"
            " (1.0 = zero-overhead sharding), NOT ICI scaling"
        ),
        "config": "thin-lens bidir lightgrid 128x128 @ 2spp",
        "results": results,
        "overhead_efficiency": {
            str(r["n"]): r["samples_per_s"] / base for r in results
        },
        "halo_merge": halo_entry,
    }
    path = os.path.join(REPO, "BENCH_SCALING.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
