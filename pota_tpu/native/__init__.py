"""ctypes bindings for the native runtime library (with auto-build).

The compute path is JAX/XLA; the runtime around it (sample-stream IO for
golden replay, EXR output) has a native C++ fast path here, mirroring the
reference's C++ runtime.  Falls back to pure python when no compiler is
available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpotanative.so")
_SRC = os.path.join(_DIR, "potanative.cpp")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["c++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building on demand) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.pota_stream_write.restype = ctypes.c_int
    lib.pota_stream_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint64, ctypes.c_uint32,
    ]
    lib.pota_stream_info.restype = ctypes.c_int
    lib.pota_stream_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.pota_stream_read.restype = ctypes.c_int
    lib.pota_stream_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
    ]
    lib.pota_stream_parse_text.restype = ctypes.c_int64
    lib.pota_stream_parse_text.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
    ]
    lib.pota_exr_write.restype = ctypes.c_int
    lib.pota_exr_write.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_uint32, ctypes.c_uint32,
    ]
    _lib = lib
    return _lib


# -------------------------------------------------------------- sample IO --

STREAM_FIELDS = (
    "r", "g", "b", "a", "z", "px", "py",
    "Px", "Py", "Pz", "dirx", "diry", "dirz",
)


def write_sample_stream(path: str, data: np.ndarray) -> None:
    """Write an [N, F] float32 sample stream (native, python fallback)."""
    data = np.ascontiguousarray(data, np.float32)
    lib = get_lib()
    if lib is not None:
        rc = lib.pota_stream_write(
            path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            data.shape[0], data.shape[1],
        )
        if rc == 0:
            return
    # fallback
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack("<IIQII", 0x41544F50, 1, data.shape[0],
                            data.shape[1], 0))
        f.write(data.tobytes())


def read_sample_stream(path: str) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        n = ctypes.c_uint64()
        nf = ctypes.c_uint32()
        if lib.pota_stream_info(path.encode(), ctypes.byref(n), ctypes.byref(nf)) == 0:
            out = np.empty((n.value, nf.value), np.float32)
            rc = lib.pota_stream_read(
                path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out.size,
            )
            if rc == 0:
                return out
    import struct

    with open(path, "rb") as f:
        magic, _ver, n, nf, _ = struct.unpack("<IIQII", f.read(24))
        assert magic == 0x41544F50, "bad stream magic"
        return np.frombuffer(f.read(), "<f4").reshape(n, nf).copy()


def parse_text_samples(path: str, max_floats: int = 10_000_000) -> np.ndarray:
    """Parse whitespace-separated float dumps (reference sampledata.txt shape)."""
    lib = get_lib()
    if lib is not None:
        out = np.empty((max_floats,), np.float32)
        n = lib.pota_stream_parse_text(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_floats,
        )
        if n >= 0:
            return out[:n].copy()
    return np.loadtxt(path, dtype=np.float32).ravel()


def write_exr_native(path: str, channels: dict) -> bool:
    """Native EXR write; returns False if unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return False
    names = sorted(channels.keys())
    h, w = np.asarray(channels[names[0]]).shape
    planes = np.ascontiguousarray(
        np.stack([np.asarray(channels[n], np.float32) for n in names]),
        np.float32,
    )
    blob = b"".join(n.encode() + b"\x00" for n in names)
    rc = lib.pota_exr_write(
        path.encode(), blob, len(names),
        planes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
    )
    return rc == 0
