"""(Re)generate the committed golden EXRs in tests/goldens/.

Run on the CPU backend (the same platform the test suite uses):
``python scripts/make_goldens.py [key ...]``.  Regenerating goldens is an
intentional act — commit the new EXRs together with the change that
justified them.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)  # compile locally on CPU
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

from pota_tpu.io.exr import write_exr
from pota_tpu.utils.cache import enable_compilation_cache

import golden_configs as gc


def main():
    enable_compilation_cache()
    keys = sys.argv[1:] or list(gc.GOLDENS)
    os.makedirs(gc.GOLDEN_DIR, exist_ok=True)
    for key in keys:
        planes = gc.GOLDENS[key]()
        channels = gc.planes_to_channels(planes)
        path = gc.golden_path(key)
        write_exr(path, channels)
        import numpy as np

        rgba = planes.get("rgba")
        stats = (
            f"mean={np.mean(rgba):.5f} max={np.max(rgba):.3f}"
            if rgba is not None else ""
        )
        print(f"[golden] {key} -> {path} ({len(channels)} channels) {stats}",
              flush=True)


if __name__ == "__main__":
    main()
