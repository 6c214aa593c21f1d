"""Minimal self-contained OpenEXR 2.0 scanline I/O (uncompressed, float32).

The reference writes EXRs through Arnold drivers (and tinyexr in the CUDA
prototype, ``src/cuda_prototype/lentil_thin_lens_bokeh_cuda.cu:36-87``).
This is a dependency-free equivalent: enough of the EXR format to exchange
images with any DCC/compositor.  A C++ fast path lives in
``pota_tpu/native`` (used when built); this pure-python version is the
always-available fallback and the format oracle for tests.
"""
from __future__ import annotations

import struct

import numpy as np

_MAGIC = 20000630
_VERSION = 2
_PIXELTYPE_FLOAT = 2  # OpenEXR: UINT=0, HALF=1, FLOAT=2
_COMPRESSION_NONE = 0
_LINEORDER_INC_Y = 0


def _attr(name: bytes, type_: bytes, data: bytes) -> bytes:
    return name + b"\x00" + type_ + b"\x00" + struct.pack("<i", len(data)) + data


def write_exr(path: str, channels: dict, height: int | None = None, width: int | None = None) -> None:
    """Write named float32 planes to an uncompressed scanline EXR.

    ``channels`` maps channel name (e.g. "R", "G", "B", "A", "Z") to a 2D
    array of identical shapes.
    """
    names = sorted(channels.keys())  # EXR requires alphabetical channel order
    first = np.asarray(channels[names[0]])
    h, w = first.shape
    planes = {n: np.asarray(channels[n], dtype="<f4") for n in names}
    for n in names:
        assert planes[n].shape == (h, w), f"channel {n} shape mismatch"

    chlist = b""
    for n in names:
        chlist += n.encode() + b"\x00"
        chlist += struct.pack("<iiii", _PIXELTYPE_FLOAT, 0, 1, 1)
    chlist += b"\x00"

    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b""
    header += _attr(b"channels", b"chlist", chlist)
    header += _attr(b"compression", b"compression", struct.pack("<B", _COMPRESSION_NONE))
    header += _attr(b"dataWindow", b"box2i", box)
    header += _attr(b"displayWindow", b"box2i", box)
    header += _attr(b"lineOrder", b"lineOrder", struct.pack("<B", _LINEORDER_INC_Y))
    header += _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"  # end of header

    scanline_bytes = 4 * w * len(names)
    offset_table_pos = 8 + len(header)
    data_start = offset_table_pos + 8 * h
    offsets = [
        data_start + y * (8 + scanline_bytes) for y in range(h)
    ]

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, _VERSION))
        f.write(header)
        f.write(struct.pack(f"<{h}Q", *offsets))
        for y in range(h):
            f.write(struct.pack("<ii", y, scanline_bytes))
            for n in names:
                f.write(planes[n][y].tobytes())


def read_exr(path: str) -> dict:
    """Read an uncompressed float32 scanline EXR written by :func:`write_exr`."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<ii", data, 0)
    assert magic == _MAGIC, "not an EXR file"
    pos = 8
    attrs = {}
    while data[pos] != 0:
        end = data.index(b"\x00", pos)
        name = data[pos:end].decode()
        pos = end + 1
        end = data.index(b"\x00", pos)
        type_ = data[pos:end].decode()
        pos = end + 1
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        attrs[name] = (type_, data[pos : pos + size])
        pos += size
    pos += 1  # header terminator

    # parse channel list
    chdata = attrs["channels"][1]
    names = []
    cpos = 0
    while chdata[cpos] != 0:
        cend = chdata.index(b"\x00", cpos)
        names.append(chdata[cpos:cend].decode())
        cpos = cend + 1 + 16
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    (compression,) = struct.unpack("<B", attrs["compression"][1])
    assert compression == _COMPRESSION_NONE, "only uncompressed EXR supported"

    pos += 8 * h  # skip offset table
    planes = {n: np.empty((h, w), dtype=np.float32) for n in names}
    for y in range(h):
        _, nbytes = struct.unpack_from("<ii", data, pos)
        pos += 8
        row = np.frombuffer(data, dtype="<f4", count=w * len(names), offset=pos)
        pos += nbytes
        for i, n in enumerate(names):
            planes[n][y] = row[i * w : (i + 1) * w]
    return planes


def write_ppm(path: str, rgb: np.ndarray, gamma: float = 2.2) -> None:
    """Quick-look 8-bit PPM (tonemapped) for eyeballing renders."""
    img = np.clip(np.asarray(rgb, np.float32), 0.0, None)
    img = np.clip(img ** (1.0 / gamma), 0.0, 1.0)
    u8 = (img * 255.0 + 0.5).astype(np.uint8)
    h, w = u8.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(u8.tobytes())
