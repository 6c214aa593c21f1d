"""Golden sample-stream capture & replay.

The reference's only regression fixture is a captured sample dump replayed
through the splat offline (zpelgrims/pota ``tests/cuda/sampledata.txt`` +
``src/cuda_prototype/lentil_thin_lens_bokeh_cuda.cu:285-295``): render once,
dump every AA sample's (rgba, z, world position), then re-splat without the
renderer and diff images.  This module is the TPU build's version of that
pattern, using the native binary stream format
(:mod:`pota_tpu.native`).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig, RenderConfig

# fixed capture schema, one float32 row per AA sample
FIELDS = (
    "px", "py", "r", "g", "b", "a", "z",
    "Px", "Py", "Pz", "dirx", "diry", "dirz", "time", "obj_id",
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class NullScene:
    """Occlusion-free stand-in scene for offline replay (the CUDA prototype
    has no scene access either — its splats are never occlusion-tested)."""

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()

    def occluded(self, p_from, p_to, t_min=1e-3):
        return jnp.zeros(p_from.shape[:-1], dtype=bool)

    @property
    def n_objects(self) -> int:
        return 0


def capture_stream(stream: dict) -> np.ndarray:
    """Flatten a renderer sample stream into the [N, 15] capture schema."""
    n = stream["rgba"].shape[0]
    cols = [
        stream["px"], stream["py"],
        stream["rgba"][:, 0], stream["rgba"][:, 1],
        stream["rgba"][:, 2], stream["rgba"][:, 3],
        stream["z"],
        stream["P"][:, 0], stream["P"][:, 1], stream["P"][:, 2],
        stream["raydir"][:, 0], stream["raydir"][:, 1], stream["raydir"][:, 2],
        stream.get("time", jnp.zeros(n)),
        stream.get("obj_id", jnp.full(n, -1)).astype(jnp.float32),
    ]
    return np.stack([np.asarray(c, np.float32) for c in cols], -1)


def stream_from_capture(data: np.ndarray) -> dict:
    """Rebuild a splat-ready sample stream from captured rows."""
    d = jnp.asarray(data, jnp.float32)
    return {
        "px": d[:, 0].astype(jnp.int32),
        "py": d[:, 1].astype(jnp.int32),
        "rgba": d[:, 2:6],
        "z": d[:, 6],
        "P": d[:, 7:10],
        "raydir": d[:, 10:13],
        "time": d[:, 13],
        "obj_id": d[:, 14].astype(jnp.int32),
    }


def save_capture(path: str, stream: dict) -> None:
    from ..native import write_sample_stream

    write_sample_stream(path, capture_stream(stream))


def load_capture(path: str) -> dict:
    from ..native import read_sample_stream

    return stream_from_capture(read_sample_stream(path))


def replay_splat(cfg: CameraConfig, rc: RenderConfig, stream: dict,
                 cam_to_world, scene=None, po_lens=None, po_state=None):
    """Re-splat a captured stream into a resolved image (offline imager).

    With ``scene=None`` occlusion probes are skipped (prototype-style
    replay); pass the original scene for bit-faithful replay of a live
    render.
    """
    from .splat import resolve_imager, splat_frame

    scene = scene if scene is not None else NullScene()
    fb = splat_frame(
        cfg, rc, scene, stream, cam_to_world, po_lens=po_lens,
        po_state=po_state,
    )
    return resolve_imager(rc, fb), fb
