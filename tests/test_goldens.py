"""Golden-image acceptance gates.

Each config in :mod:`golden_configs` re-renders and must match the
committed EXR in tests/goldens/ to float32 tolerance — a one-pixel
regression anywhere in the pipeline (sampling, camera, gates, splat,
resolve) turns these red.  Regenerate deliberately with
``python scripts/make_goldens.py`` and commit the diff.

Reference analog: the A/B comparison images and the captured-sample replay
(/root/reference/tests/website_comparison_images/,
/root/reference/tests/cuda/sampledata.txt).
"""
import os

import numpy as np
import pytest

import golden_configs as gc
from pota_tpu.io.exr import read_exr


@pytest.mark.parametrize("key", sorted(gc.GOLDENS))
def test_golden(key):
    path = gc.golden_path(key)
    assert os.path.exists(path), (
        f"golden missing: run `python scripts/make_goldens.py {key}`"
    )
    golden = read_exr(path)
    planes = gc.GOLDENS[key]()
    channels = gc.planes_to_channels(planes)
    assert set(channels) == set(golden), (
        set(channels) ^ set(golden)
    )
    for name, arr in channels.items():
        ref = golden[name]
        np.testing.assert_allclose(
            arr, ref, rtol=1e-4, atol=2e-5,
            err_msg=f"{key}:{name} drifted from golden",
        )
    # goldens must contain actual signal
    rgba = planes.get("rgba")
    if rgba is not None:
        assert float(np.abs(rgba).max()) > 1e-3, f"{key} golden is black"
