"""Native library: sample-stream IO and EXR fast path."""
import numpy as np

from pota_tpu.io.exr import read_exr, write_exr
from pota_tpu.native import (
    get_lib,
    parse_text_samples,
    read_sample_stream,
    write_exr_native,
    write_sample_stream,
)


def test_native_builds():
    assert get_lib() is not None, "C++ toolchain present, lib must build"


def test_stream_roundtrip(tmp_path, rng_np):
    d = rng_np.normal(size=(5000, 13)).astype(np.float32)
    p = str(tmp_path / "s.pstream")
    write_sample_stream(p, d)
    np.testing.assert_array_equal(read_sample_stream(p), d)


def test_text_parse(tmp_path):
    p = str(tmp_path / "dump.txt")
    with open(p, "w") as f:
        f.write("1.5 2.25 -3.0\n4.0 5 6e-2\n")
    vals = parse_text_samples(p)
    np.testing.assert_allclose(vals, [1.5, 2.25, -3.0, 4.0, 5.0, 0.06])


def test_native_exr_matches_python_reader(tmp_path, rng_np):
    img = {
        "R": rng_np.normal(size=(17, 23)).astype(np.float32),
        "G": rng_np.normal(size=(17, 23)).astype(np.float32),
        "Z": rng_np.normal(size=(17, 23)).astype(np.float32),
    }
    p_native = str(tmp_path / "n.exr")
    p_py = str(tmp_path / "p.exr")
    assert write_exr_native(p_native, img)
    write_exr(p_py, img)
    a, b = read_exr(p_native), read_exr(p_py)
    for k in img:
        np.testing.assert_array_equal(a[k], img[k])
        np.testing.assert_array_equal(b[k], img[k])
    # byte-identical files
    assert open(p_native, "rb").read() == open(p_py, "rb").read()
