"""Parameter reference generator (the uigen.py capability).

The reference compiles a single UI DSL (``src/lentil_camera.ui``) into four
DCC formats via ``src/uigen.py`` (SURVEY.md C18).  The TPU build's single
source of truth is the CameraConfig dataclass; this module renders it into
a markdown parameter reference (and a JSON schema for programmatic UIs) so
the config surface stays documented from one source.

Run: ``python -m pota_tpu.utils.paramdoc [out.md]``
"""
from __future__ import annotations

import dataclasses
import enum
import json

from ..config import CameraConfig, RenderConfig

# descriptions mirror the reference's UI tooltips (src/lentil_camera.ui)
_DESCRIPTIONS = {
    "camera_type": "Lens model family: extended thin-lens or fitted polynomial optics.",
    "units": "Scene length unit (mm/cm/dm/m); controls all ray scaling.",
    "sensor_width": "Film back width in mm (36 = full frame).",
    "enable_dof": "Depth of field on/off; off sends all rays through the aperture center.",
    "fstop": "F-number. 0.0 means wide open (PO: the lens' maximum aperture).",
    "focus_distance": "Focus distance in scene units.",
    "aperture_blades": "Polygonal iris blade count; <2 = circular aperture.",
    "exposure": "Linear multiplier on every camera ray weight.",
    "lens_model": "Catalog lens for the polynomial-optics camera (44 entries).",
    "wavelength": "Design wavelength in nm for the PO path.",
    "extra_sensor_shift": "Additional sensor shift in mm on top of the focus solve.",
    "focal_length": "Thin-lens focal length in mm.",
    "optical_vignetting_distance": "Distance of the virtual second aperture (0 = off); creates cat-eye bokeh.",
    "optical_vignetting_radius": "Radius scale of the virtual second aperture.",
    "abb_spherical": "Spherical aberration: biases aperture samples toward rim (>0.5) or center (<0.5).",
    "abb_distortion": "Barrel distortion strength.",
    "abb_coma": "Coma aberration strength.",
    "abb_chromatic": "Chromatic aberration strength (PO: 3-wavelength splat; TL: focus shift per channel).",
    "abb_chromatic_type": "green_magenta or red_cyan fringing.",
    "circle_to_square": "Lerp aperture samples toward a square (squircle bokeh).",
    "bokeh_anamorphic": "Anamorphic squeeze of the aperture (0 = none).",
    "bokeh_enable_image": "Sample the aperture from an image instead of analytically.",
    "bokeh_image_path": "Path to the aperture image (png/jpg/exr).",
    "vignetting_retries": "Max resampling attempts for vignetted rays.",
    "bidir_sample_mult": "Bidirectional sample count multiplier; 0 disables redistribution.",
    "bidir_add_energy": "Extra energy added to redistributed samples.",
    "bidir_add_energy_minimum_luminance": "Luminance threshold where extra energy starts.",
    "bidir_add_energy_transition": "Soft-transition width for the extra energy.",
    "enable_bidir_transmission": "Redistribute transmitted (glass) energy too.",
    "enable_skydome": "Redistribute skydome samples (position synthesized from ray direction).",
    "max_bidir_samples": "Static cap on backward splats per source sample (TPU lane width).",
    # RenderConfig
    "xres": "Image width in pixels.",
    "yres": "Image height in pixels.",
    "spp": "AA samples per pixel.",
    "region_min_x": "Render region (inclusive).",
    "region_min_y": "Render region (inclusive).",
    "region_max_x": "Render region (inclusive); None = full frame.",
    "region_max_y": "Render region (inclusive); None = full frame.",
    "filter_width": "Gaussian filter width for the passthrough path.",
    "enable_redistribution": "Bidirectional bokeh redistribution on/off.",
    "enable_id_matte": "Accumulate cryptomatte-style ranked object-id coverage.",
}


def param_table(cls) -> list[dict]:
    rows = []
    for f in dataclasses.fields(cls):
        default = f.default
        if isinstance(default, enum.Enum):
            default = default.name
        rows.append(
            {
                "name": f.name,
                "type": getattr(f.type, "__name__", str(f.type)),
                "default": default,
                "description": _DESCRIPTIONS.get(f.name, ""),
            }
        )
    return rows


def render_markdown() -> str:
    out = ["# pota_tpu parameter reference", "",
           "Generated from the config dataclasses "
           "(`python -m pota_tpu.utils.paramdoc`). The parameter set and "
           "defaults mirror the reference camera node "
           "(zpelgrims/pota src/lentil_camera.cpp:19-52).", ""]
    for title, cls in (("CameraConfig", CameraConfig),
                       ("RenderConfig", RenderConfig)):
        out += [f"## {title}", "", "| parameter | type | default | description |",
                "|---|---|---|---|"]
        for r in param_table(cls):
            out.append(
                f"| `{r['name']}` | {r['type']} | `{r['default']}` | {r['description']} |"
            )
        out.append("")
    return "\n".join(out)


def render_json_schema() -> str:
    return json.dumps(
        {
            "CameraConfig": param_table(CameraConfig),
            "RenderConfig": param_table(RenderConfig),
        },
        indent=2,
        default=str,
    )


if __name__ == "__main__":
    import sys

    path = sys.argv[1] if len(sys.argv) > 1 else "docs/parameters.md"
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(render_markdown())
    print(f"wrote {path}")
