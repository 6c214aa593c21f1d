"""AOV (arbitrary output variable) framework.

TPU-native equivalent of the reference's AOV machinery:

* ``TokenizedOutput`` parses Arnold-style output strings
  (``"[camera] name type filter driver [HALF]"``) exactly like the
  reference's TokenizedOutputLentil (zpelgrims/pota ``src/aov_data.h:12-110``)
  — this is the framework's render-output config surface;
* ``AOVSpec`` describes one output plane: its type, its filter class
  (gaussian-accumulate vs closest-by-depth, ref ``src/lentil.h:823-929``),
  and which per-sample stream field feeds it;
* the default AOV set mirrors the filter's required AOVs
  (``src/lentil_filter.cpp:16-26``): RGBA, P, Z, lentil_time, lentil_debug,
  lentil_raydir — plus an object-ID matte (the cryptomatte capability,
  SURVEY.md C13, as a dense per-id coverage buffer resolved to ranked pairs).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

GAUSSIAN = "gaussian"
CLOSEST = "closest"

_TYPES = ("RGBA", "RGB", "VECTOR", "FLOAT")


@dataclasses.dataclass(frozen=True)
class AOVSpec:
    name: str              # output plane name ("RGBA", "Z", ...)
    type: str              # one of _TYPES
    filter: str            # GAUSSIAN or CLOSEST
    source: str            # stream key providing per-sample values
    redistribute: bool = True   # ride the bidirectional splat lanes

    def __post_init__(self):
        assert self.type in _TYPES, self.type
        assert self.filter in (GAUSSIAN, CLOSEST), self.filter


# The canonical AOV set (the operator builds this list in the reference,
# src/lentil_operator.cpp:99-131 + filter required_aovs)
DEFAULT_AOVS = (
    AOVSpec("RGBA", "RGBA", GAUSSIAN, "rgba"),
    AOVSpec("Z", "FLOAT", CLOSEST, "z"),
    AOVSpec("P", "VECTOR", CLOSEST, "P"),
    AOVSpec("lentil_raydir", "RGB", CLOSEST, "raydir"),
    AOVSpec("lentil_time", "FLOAT", CLOSEST, "time"),
    AOVSpec("lentil_debug", "FLOAT", CLOSEST, "debug",
            redistribute=False),
)


def aov_value_rgba(stream: dict, spec: AOVSpec):
    """Fetch an AOV's per-sample values as RGBA4, like the filter's
    per-sample cache (ref src/lentil_filter.cpp:206-234)."""
    import jax.numpy as jnp

    v = stream[spec.source]
    if spec.type == "RGBA":
        return v
    if spec.type in ("RGB", "VECTOR"):
        return jnp.concatenate([v, jnp.ones_like(v[..., :1])], -1)
    # FLOAT
    return jnp.stack([v, v, v, jnp.ones_like(v)], -1)


# ------------------------------------------------------- output tokenizing --


@dataclasses.dataclass
class TokenizedOutput:
    """Parsed Arnold-style output string (ref src/aov_data.h:30-90)."""

    camera_tok: str = ""
    aov_name_tok: str = ""
    aov_type_tok: str = ""
    filter_tok: str = ""
    driver_tok: str = ""
    half_flag: bool = False

    @classmethod
    def parse(cls, output_string: str) -> "TokenizedOutput":
        toks = output_string.split()
        out = cls()
        if toks and toks[-1] == "HALF":
            out.half_flag = True
            toks = toks[:-1]
        # with camera prefix there are 5 tokens, without 4
        if len(toks) == 5:
            out.camera_tok, toks = toks[0], toks[1:]
        if len(toks) != 4:
            raise ValueError(f"unparsable output string: {output_string!r}")
        out.aov_name_tok, out.aov_type_tok, out.filter_tok, out.driver_tok = toks
        return out

    def rebuild(self) -> str:
        toks = []
        if self.camera_tok:
            toks.append(self.camera_tok)
        toks += [self.aov_name_tok, self.aov_type_tok, self.filter_tok,
                 self.driver_tok]
        if self.half_flag:
            toks.append("HALF")
        return " ".join(toks)


_TYPE_MAP = {
    "RGBA": "RGBA", "rgba": "RGBA",
    "RGB": "RGB", "rgb": "RGB",
    "VECTOR": "VECTOR", "vector": "VECTOR", "VEC": "VECTOR", "vec": "VECTOR",
    "FLOAT": "FLOAT", "float": "FLOAT", "FLT": "FLOAT", "flt": "FLOAT",
}

_CLOSEST_FILTERS = ("closest_filter",)


def specs_from_output_strings(outputs, source_map=None,
                              replaced_filter="lentil_replaced_filter"):
    """Build AOVSpecs from Arnold-style output strings.

    This is the operator's filter-replacement bookkeeping
    (ref src/lentil_operator.cpp:84-86 + sanitize_aov_list,
    src/aov_data.h:168-176): every output gets its filter swapped to the
    lentil filter; duplicates are removed; the original filter class decides
    gaussian-vs-closest resolve behavior.
    """
    source_map = source_map or {}
    seen = set()
    specs = []
    for s in outputs:
        to = TokenizedOutput.parse(s)
        if to.aov_name_tok in seen:
            continue
        seen.add(to.aov_name_tok)
        filt = CLOSEST if to.filter_tok in _CLOSEST_FILTERS else GAUSSIAN
        to.filter_tok = replaced_filter
        specs.append(
            AOVSpec(
                name=to.aov_name_tok,
                type=_TYPE_MAP.get(to.aov_type_tok, "RGBA"),
                filter=filt,
                source=source_map.get(
                    to.aov_name_tok,
                    {"RGBA": "rgba", "Z": "z", "P": "P"}.get(
                        to.aov_name_tok, to.aov_name_tok
                    ),
                ),
            )
        )
    return tuple(specs)
