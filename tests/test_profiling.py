"""Profiling/observability utilities (SURVEY.md §5 tracing subsystem)."""
import os

import jax.numpy as jnp

from pota_tpu.utils import profiling


def test_ray_timer_counts():
    t = profiling.RayTimer(rays_per_call=1000)
    for _ in range(3):
        t.run(lambda: jnp.arange(1000).sum())
    assert t.rays == 3000
    assert t.total_s > 0
    assert t.rays_per_s > 0
    assert "camera rays" in t.summary()


def test_log_once_dedupes(capsys):
    profiling._printed_once.clear()
    profiling.log("camera po", "hello", once=True)
    profiling.log("camera po", "hello", once=True)
    err = capsys.readouterr().err
    assert err.count("[POTA CAMERA PO] hello") == 1


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        jnp.ones((64, 64)).sum().block_until_ready()
    # jax writes a plugins/profile/<ts>/ tree
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no profile artifacts written"


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)  # empty on CPU is fine
    for v in stats.values():
        assert "bytes_in_use" in v
