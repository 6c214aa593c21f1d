"""Parameter reference / DCC UI generator (the uigen.py capability).

The reference compiles a single UI DSL (``src/lentil_camera.ui``) into four
DCC formats via ``src/uigen.py`` (SURVEY.md C18): Arnold .mtd metadata,
a Maya Attribute Editor template, Katana .args XML, and C4D resources.
The TPU build's single source of truth is the CameraConfig dataclass; this
module renders it into the same class of artifacts from one source:

  * markdown parameter reference (docs/parameters.md)
  * JSON schema for programmatic UIs (docs/parameters.json)
  * Arnold-style .mtd metadata block      (render_mtd)
  * Katana-style .args XML                (render_args)
  * Maya AE template (Python)             (render_ae_template)

Run: ``python -m pota_tpu.utils.paramdoc [docs_dir]`` to write all of them.
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
    "splat_queue_mult": "Splat queue capacity as a multiple of the AA sample count (static shape for XLA).",
    "lt_newton_iterations": "Newton iterations for the backward lt_sample_aperture solve.",
    "splat_chunks": "Number of sequential splat stages (bounds peak HBM at high resolution).",
    "trace_chunks": "Number of sequential forward-trace chunks with rematerialization (bounds peak HBM for differentiable high-resolution renders).",
    "differentiate_splat_geometry": "Differentiate pixel positions/weights of splats too (heavier transpose graph).",
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
    "enforce_aa_gate": "Disable redistribution below the final AA level (the reference's inv_density > 0.2 preview-pass gate).",
}


# UI ranges (min, max, softmin, softmax); mirrors the intent of the reference
# UI DSL ranges (src/lentil_camera.ui) without copying its values verbatim —
# hard bounds come from the physics, soft bounds are sensible slider spans.
_RANGES = {
    "sensor_width": (1.0, 1000.0, 8.0, 70.0),
    "fstop": (0.0, 64.0, 0.0, 22.0),
    "focus_distance": (0.0, 1e9, 0.0, 5000.0),
    "aperture_blades": (0, 16, 0, 9),
    "exposure": (0.0, 1e6, 0.0, 8.0),
    "wavelength": (350.0, 850.0, 400.0, 700.0),
    "extra_sensor_shift": (-45.0, 45.0, -5.0, 5.0),
    "focal_length": (1.0, 1000.0, 12.0, 200.0),
    "optical_vignetting_distance": (0.0, 1000.0, 0.0, 100.0),
    "optical_vignetting_radius": (0.0, 10.0, 0.0, 2.0),
    "abb_spherical": (0.0, 1.0, 0.0, 1.0),
    "abb_distortion": (-10.0, 10.0, -1.0, 1.0),
    "abb_coma": (0.0, 10.0, 0.0, 2.0),
    "abb_chromatic": (0.0, 10.0, 0.0, 2.0),
    "circle_to_square": (0.0, 1.0, 0.0, 1.0),
    "bokeh_anamorphic": (0.0, 10.0, 0.0, 4.0),
    "vignetting_retries": (0, 500, 0, 50),
    "bidir_sample_mult": (0, 1000, 0, 50),
    "bidir_add_energy": (0.0, 1000.0, 0.0, 10.0),
    "bidir_add_energy_minimum_luminance": (0.0, 1e6, 0.0, 10.0),
    "bidir_add_energy_transition": (0.0, 1e6, 0.0, 10.0),
    "max_bidir_samples": (1, 4096, 4, 2000),
}


def param_table(cls) -> list[dict]:
    rows = []
    for f in dataclasses.fields(cls):
        default = f.default
        options = None
        if isinstance(default, enum.Enum):
            options = [e.name.lower() for e in type(default)]
            default = default.name
        row = {
            "name": f.name,
            "type": getattr(f.type, "__name__", str(f.type)),
            "default": default,
            "description": _DESCRIPTIONS.get(f.name, ""),
        }
        if options:
            row["options"] = options
        if f.name in _RANGES:
            lo, hi, slo, shi = _RANGES[f.name]
            row.update(min=lo, max=hi, softmin=slo, softmax=shi)
        if cls is CameraConfig:
            row["group"] = _group_of(f.name)
            if f.name in _ENABLE_WHEN:
                dep, op, val = _ENABLE_WHEN[f.name]
                row["enable_when"] = {"param": dep, "op": op, "value": val}
        rows.append(row)
    return rows


def _group_of(name: str) -> str:
    for gname, names in _GROUPS:
        if names is not None and name in names:
            return gname
    return "Advanced"


def _label(name: str) -> str:
    return name.replace("_", " ").title().replace("Abb ", "Aberration: ")


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


def render_mtd(node_name: str = "pota_camera") -> str:
    """Arnold-style .mtd node metadata (ref uigen.py WriteMTD output class)."""
    out = [f"[node {node_name}]", '    desc                      STRING  '
           '"TPU-native polynomial-optics lens camera (pota_tpu)"',
           '    maya.id                   INT     0x00116420', ""]
    for r in param_table(CameraConfig):
        out.append(f"    [attr {r['name']}]")
        if r["description"]:
            out.append(f'        desc        STRING  "{r["description"]}"')
        if "group" in r:
            out.append(f'        ui.group    STRING  "{r["group"]}"')
        if "enable_when" in r:
            ew = r["enable_when"]
            out.append(
                '        houdini.disable_when STRING  '
                f'"{{ {ew["param"]} {ew["op"]}! {ew["value"]} }}"'
            )
        for key, mtd in (("min", "min"), ("max", "max"),
                         ("softmin", "softmin"), ("softmax", "softmax")):
            if key in r:
                typ = "INT" if r["type"] == "int" else "FLOAT"
                out.append(f"        {mtd:<12}{typ:<8}{r[key]}")
        if "options" in r:
            out.append('        widget      STRING  "popup"')
        out.append("")
    return "\n".join(out)


def render_args(node_name: str = "pota_camera") -> str:
    """Katana-style .args XML (ref uigen.py WriteArgs output class)."""
    from xml.sax.saxutils import escape

    out = ['<!-- generated by pota_tpu.utils.paramdoc -->', "",
           '<args format="1.0">', "",
           f'<page name="{_label(node_name)}" open="True">']
    rows = param_table(CameraConfig)
    for gname, members in _c4d_groups(rows):  # shared group layout
        out.append(f'<group name="{gname}" open="True">')
        for r in members:
            attrs = [f'name="{r["name"]}"', f'label="{_label(r["name"])}"']
            if r["type"] == "bool":
                attrs.append('widget="checkBox"')
            elif "options" in r:
                attrs.append('widget="mapper"')
            elif r["type"] in ("int", "float") and "softmin" in r:
                attrs += ['slider="True"', f'slidermin="{r["softmin"]}"',
                          f'min="{r["min"]}"', f'slidermax="{r["softmax"]}"',
                          f'max="{r["max"]}"']
            if "enable_when" in r:
                # Katana conditional visibility (the reference UI's
                # enable-when declarations, src/lentil_camera.ui)
                ew = r["enable_when"]
                op = {"==": "equalTo", ">": "greaterThan"}[ew["op"]]
                val = ew["value"]
                if isinstance(val, bool):
                    val = int(val)
                attrs += [f'conditionalVisOp="{op}"',
                          f'conditionalVisPath="../{ew["param"]}"',
                          f'conditionalVisValue="{val}"']
            if "options" in r:
                out.append(f"\t<param {' '.join(attrs)}>")
                out.append('\t\t<hintdict name="options">')
                for opt in r["options"]:
                    out.append(f'\t\t<string value="{opt}"/>')
                out.append("\t\t</hintdict>")
                if r["description"]:
                    out.append(f"\t\t<help>{escape(r['description'])}</help>")
                out.append("\t</param>")
            elif r["description"]:
                out.append(f"\t<param {' '.join(attrs)}>")
                out.append(f"\t\t<help>{escape(r['description'])}</help>")
                out.append("\t</param>")
            else:
                out.append(f"\t<param {' '.join(attrs)}/>")
        out.append("</group>")
    out += ["</page>", "", "</args>", ""]
    return "\n".join(out)


def render_ae_template(node_name: str = "pota_camera") -> str:
    """Maya Attribute Editor template, Python flavor (ref WriteAETemplate)."""
    cls = "AE" + "".join(w.title() for w in node_name.split("_")) + "Template"
    rows = param_table(CameraConfig)
    dim_rules = {
        r["name"]: r["enable_when"] for r in rows if "enable_when" in r
    }
    out = ["# generated by pota_tpu.utils.paramdoc — Maya AE template",
           "from mtoa.ui.ae.templates import CameraTemplate", "", "",
           f"class {cls}(CameraTemplate):",
           "    # enable-when rules (the reference UI's conditional-disable",
           "    # declarations, src/lentil_camera.ui): param -> condition",
           f"    DIM_RULES = {dim_rules!r}", "",
           "    def _dim(self, nodeName):",
           "        import maya.cmds as cmds",
           "        ops = {'==': lambda a, b: a == b,",
           "               '>': lambda a, b: a > b}",
           "        for name, rule in self.DIM_RULES.items():",
           "            try:",
           "                v = cmds.getAttr(nodeName + '.' + rule['param'])",
           "            except Exception:",
           "                continue",
           "            want = rule['value']",
           "            if isinstance(want, str):",
           "                want = v  # enum-by-name: resolved upstream",
           "            self.dimControl(nodeName, name,",
           "                            not ops[rule['op']](v, want))", "",
           "    def setup(self):",
           "        self.beginScrollLayout()"]
    for gname, members in _c4d_groups(rows):
        out.append(
            f'        self.beginLayout("{gname}", collapse='
            f'{gname == "Advanced"})'
        )
        for r in members:
            ann = r["description"].replace('"', "'")
            out.append(
                f'        self.addControl("{r["name"]}", '
                f'label="{_label(r["name"])}", annotation="{ann}")'
            )
        out.append("        self.endLayout()")
    out += ["        self.addExtraControls()",
            "        self.endScrollLayout()", ""]
    return "\n".join(out)


# UI groups: the reference's UI DSL organizes parameters into tabs/groups
# (src/lentil_camera.ui Group/Tab declarations, compiled by uigen.py:25-70);
# our flat config source gets an equivalent grouping here, shared by every
# UI target (.mtd / .args / AE / C4D / markdown / JSON).
_GROUPS = (
    ("Lens", ("camera_type", "units", "sensor_width", "enable_dof", "fstop",
              "focus_distance", "aperture_blades", "exposure", "lens_model",
              "wavelength", "extra_sensor_shift", "focal_length")),
    ("Aberrations", ("optical_vignetting_distance", "optical_vignetting_radius",
                     "abb_spherical", "abb_distortion", "abb_coma",
                     "abb_chromatic", "abb_chromatic_type")),
    ("Bokeh", ("circle_to_square", "bokeh_anamorphic", "bokeh_enable_image",
               "bokeh_image_path")),
    ("Bidirectional", ("vignetting_retries", "bidir_sample_mult",
                       "bidir_add_energy",
                       "bidir_add_energy_minimum_luminance",
                       "bidir_add_energy_transition",
                       "enable_bidir_transmission", "enable_skydome")),
    ("Advanced", None),  # catch-all for the remaining params
)
_C4D_GROUPS = _GROUPS  # C4D shares the group layout

# Conditional enabling: the reference UI's enable-when logic
# (src/lentil_camera.ui conditional-disable declarations) — a parameter is
# only meaningful when its controlling parameter has the given value/state.
_ENABLE_WHEN = {
    "focal_length": ("camera_type", "==", "THIN_LENS"),
    "lens_model": ("camera_type", "==", "POLYNOMIAL_OPTICS"),
    "wavelength": ("camera_type", "==", "POLYNOMIAL_OPTICS"),
    "fstop": ("enable_dof", "==", True),
    "aperture_blades": ("enable_dof", "==", True),
    "optical_vignetting_radius": ("optical_vignetting_distance", ">", 0.0),
    "abb_chromatic_type": ("abb_chromatic", ">", 0.0),
    "bokeh_image_path": ("bokeh_enable_image", "==", True),
    "bidir_add_energy_minimum_luminance": ("bidir_add_energy", ">", 0.0),
    "bidir_add_energy_transition": ("bidir_add_energy", ">", 0.0),
}


def c4d_param_id(node_name: str, param_name: str) -> int:
    """C4DtoA parameter id: djb2 hash of ``node.param`` folded into the
    positive signed-int32 range — the id convention C4DtoA resource files
    require (ref uigen.py GenerateC4DtoAId, src/uigen.py:569-582)."""
    unique = f"{node_name}.{param_name}"
    pid = 5381
    for c in unique:
        pid = ((pid << 5) + pid) + ord(c)
    pid &= 0xFFFFFFFF
    if pid > 2147483647:
        pid = 2 * 2147483647 - pid + 2
    return pid


def _c4d_groups(rows):
    """Assign every parameter row to a C4D group (stable order)."""
    by_name = {r["name"]: r for r in rows}
    assigned = set()
    groups = []
    for gname, names in _C4D_GROUPS:
        if names is None:
            members = [r for r in rows if r["name"] not in assigned]
        else:
            members = [by_name[n] for n in names if n in by_name]
            assigned.update(r["name"] for r in members)
        if members:
            groups.append((gname, members))
    return groups


def render_c4d(node_name: str = "pota_camera") -> dict:
    """C4DtoA resource files (ref uigen.py WriteC4DtoAResourceFiles,
    src/uigen.py:772-795): the ``aitag_<node>.h`` id header, the
    ``aitag_<node>.res`` widget layout, and the ``aitag_<node>.str`` string
    table.  Returns {relative_path: text}."""
    rows = param_table(CameraConfig)
    groups = _c4d_groups(rows)
    up = node_name.upper()

    def pname(r):
        return r["name"].upper()

    # --- .h: enum of group + parameter ids -------------------------------
    h = [f"#ifndef _aitag_{node_name}_h_", f"#define _aitag_{node_name}_h_",
         "", "enum", "{", f"\tC4DAI_{up}_MAIN_GRP = 2001,"]
    for gname, _ in groups:
        h.append(f"\tC4DAI_{up}_{gname.upper().replace(' ', '_')}_GRP,")
    h.append("")
    for gname, members in groups:
        for r in members:
            h.append(
                f"\tC4DAIP_{up}_{pname(r)} = "
                f"{c4d_param_id(node_name, r['name'])},"
            )
    h += ["};", "", "#endif", ""]

    # --- .res: container layout ------------------------------------------
    res = [f"CONTAINER AITAG_{up}", "{", f"\tNAME aitag_{node_name};", "",
           "\tINCLUDE GVbase;", "", f"\tGROUP C4DAI_{up}_MAIN_GRP", "\t{",
           "\t\tDEFAULT 1;", ""]
    for gname, members in groups:
        res.append(f"\t\tGROUP C4DAI_{up}_{gname.upper().replace(' ', '_')}_GRP")
        res.append("\t\t{")
        for r in members:
            res.append(f"\t\t\tAIPARAM C4DAIP_{up}_{pname(r)} {{}}")
        res.append("\t\t}")
        res.append("")
    res += ["\t}", "}", ""]

    # --- .str: labels ----------------------------------------------------
    s = [f"STRINGTABLE aitag_{node_name}", "{",
         f'\taitag_{node_name}   "Arnold {node_name} node";', "",
         f'\tC4DAI_{up}_MAIN_GRP   "Main";']
    for gname, _ in groups:
        s.append(
            f'\tC4DAI_{up}_{gname.upper().replace(" ", "_")}_GRP   "{gname}";'
        )
    s.append("")
    for gname, members in groups:
        for r in members:
            s.append(f'\tC4DAIP_{up}_{pname(r)}   "{_label(r["name"])}";')
    s += ["}", ""]

    return {
        f"res/description/aitag_{node_name}.h": "\n".join(h),
        f"res/description/aitag_{node_name}.res": "\n".join(res),
        f"res/strings_us/description/aitag_{node_name}.str": "\n".join(s),
    }


def write_all(docs_dir: str = "docs") -> list[str]:
    import os

    dcc = os.path.join(docs_dir, "dcc")
    os.makedirs(dcc, exist_ok=True)
    written = []
    for path, text in (
        (os.path.join(docs_dir, "parameters.md"), render_markdown()),
        (os.path.join(docs_dir, "parameters.json"), render_json_schema()),
        (os.path.join(dcc, "pota_camera.mtd"), render_mtd()),
        (os.path.join(dcc, "pota_camera.args"), render_args()),
        (os.path.join(dcc, "pota_camera_ae_template.py"), render_ae_template()),
    ):
        with open(path, "w") as f:
            f.write(text)
        written.append(path)
    c4d_dir = os.path.join(dcc, "c4d")
    for rel, text in render_c4d().items():
        path = os.path.join(c4d_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
        written.append(path)
    return written


if __name__ == "__main__":
    import sys

    for p in write_all(sys.argv[1] if len(sys.argv) > 1 else "docs"):
        print(f"wrote {p}")
