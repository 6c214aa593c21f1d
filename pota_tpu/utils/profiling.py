"""Tracing / profiling / memory observability.

The reference's only instrumentation is a ns/ray counter in the deprecated
raytraced camera (zpelgrims/pota
``src/deprecated/lentil_raytraced.cpp:9,171-190``: "Average execution time:
N ns over M camera rays") and ``AiAddMemUsage`` accounting around the bokeh
image (``src/imagebokeh.h:56-79``).  TPU-native equivalents:

* :func:`trace` — ``jax.profiler`` trace context; view with TensorBoard or
  Perfetto (xprof).  Captures XLA kernel timelines, the real kernel-vs-e2e
  split.
* :class:`RayTimer` — the ns/ray counter, batched: wall time + rays/s over
  ``block_until_ready`` runs.
* :func:`device_memory_stats` — per-device live-bytes accounting (the
  AiAddMemUsage analog).
* :func:`log` — subsystem-prefixed logging in the reference's style
  (``[LENTIL CAMERA PO]`` -> ``[POTA ...]``), with print-once de-duplication
  (ref ``imager_print_once_only``, src/lentil.h:194).
"""
from __future__ import annotations

import contextlib
import sys
import time

_printed_once: set = set()


def log(subsystem: str, msg: str, once: bool = False) -> None:
    """``[POTA <SUBSYSTEM>] msg`` to stderr; ``once=True`` de-duplicates."""
    line = f"[POTA {subsystem.upper()}] {msg}"
    if once:
        if line in _printed_once:
            return
        _printed_once.add(line)
    print(line, file=sys.stderr, flush=True)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pota_trace", with_memory: bool = True):
    """Profile a region with jax.profiler (TensorBoard/Perfetto format).

    >>> with trace("/tmp/pota_trace"):
    ...     render_frame(...)  # every XLA kernel lands in the timeline
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log("PROFILER", f"trace written to {log_dir}")


class RayTimer:
    """Rays/s counter over explicit synchronized runs.

    >>> t = RayTimer(n_rays_per_call)
    >>> for _ in range(5): t.run(lambda: f(x))
    >>> t.summary()  # avg ns/ray + rays/s, reference-style report
    """

    def __init__(self, rays_per_call: int):
        self.rays_per_call = rays_per_call
        self.total_s = 0.0
        self.calls = 0

    def run(self, thunk):
        import jax

        t0 = time.perf_counter()
        out = thunk()
        jax.block_until_ready(out)
        self.total_s += time.perf_counter() - t0
        self.calls += 1
        return out

    @property
    def rays(self) -> int:
        return self.calls * self.rays_per_call

    @property
    def rays_per_s(self) -> float:
        return self.rays / self.total_s if self.total_s else 0.0

    @property
    def ns_per_ray(self) -> float:
        return (self.total_s / self.rays) * 1e9 if self.rays else 0.0

    def summary(self) -> str:
        s = (
            f"average execution time: {self.ns_per_ray:.1f} ns over "
            f"{self.rays} camera rays ({self.rays_per_s:.3e} rays/s)"
        )
        log("TIMING", s)
        return s


def device_memory_stats() -> dict:
    """Per-device memory accounting (bytes); empty dict on backends that
    don't expose allocator stats (CPU)."""
    import jax

    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
