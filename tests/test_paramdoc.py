"""C18 UI-generator parity: one config source -> multiple DCC artifacts.

Reference: src/uigen.py compiles src/lentil_camera.ui into .mtd, Maya AE,
Katana .args and C4D resources (SURVEY.md C18).  Here the single source is
the CameraConfig dataclass and the artifacts are validated structurally.
"""
import ast
import dataclasses
import json
import xml.etree.ElementTree as ET

from pota_tpu.config import CameraConfig, RenderConfig
from pota_tpu.utils import paramdoc


def test_param_table_covers_every_field():
    for cls in (CameraConfig, RenderConfig):
        rows = paramdoc.param_table(cls)
        names = {r["name"] for r in rows}
        assert names == {f.name for f in dataclasses.fields(cls)}
        # every field documented
        missing = [r["name"] for r in rows if not r["description"]]
        assert not missing, f"{cls.__name__} undocumented params: {missing}"


def test_args_xml_well_formed_and_complete():
    root = ET.fromstring(paramdoc.render_args())
    assert root.tag == "args"
    params = {p.get("name") for p in root.iter("param")}
    assert {f.name for f in dataclasses.fields(CameraConfig)} <= params
    # enums become mapper widgets with option hints
    cam_type = [p for p in root.iter("param")
                if p.get("name") == "camera_type"][0]
    assert cam_type.get("widget") == "mapper"
    opts = [s.get("value") for s in cam_type.iter("string")]
    assert "thin_lens" in opts and "polynomial_optics" in opts


def test_ae_template_is_valid_python_with_all_controls():
    src = paramdoc.render_ae_template()
    tree = ast.parse(src)
    assert any(isinstance(n, ast.ClassDef) for n in tree.body)
    for f in dataclasses.fields(CameraConfig):
        assert f'"{f.name}"' in src


def test_mtd_has_ranges_and_descs():
    mtd = paramdoc.render_mtd()
    assert "[node pota_camera]" in mtd
    assert "[attr fstop]" in mtd and "[attr lens_model]" in mtd
    # ranged attrs carry min/max metadata
    assert "softmax" in mtd


def test_c4d_resources_complete_and_consistent():
    """C4DtoA resource emission (ref uigen.py WriteC4DtoAResourceFiles,
    src/uigen.py:610-795): the .h id enum, .res layout and .str labels must
    all cover every camera parameter with consistent symbols."""
    files = paramdoc.render_c4d()
    assert set(files) == {
        "res/description/aitag_pota_camera.h",
        "res/description/aitag_pota_camera.res",
        "res/strings_us/description/aitag_pota_camera.str",
    }
    h = files["res/description/aitag_pota_camera.h"]
    res = files["res/description/aitag_pota_camera.res"]
    st = files["res/strings_us/description/aitag_pota_camera.str"]
    for f in dataclasses.fields(CameraConfig):
        sym = f"C4DAIP_POTA_CAMERA_{f.name.upper()}"
        assert sym in h and sym in res and sym in st, f.name
    # ids follow the C4DtoA djb2 convention and fit signed int32
    ids = [int(line.split("=")[1].rstrip(",").strip())
           for line in h.splitlines() if "C4DAIP_" in line and "=" in line]
    assert len(ids) == len(dataclasses.fields(CameraConfig))
    assert all(0 < i <= 2147483647 for i in ids)
    assert len(set(ids)) == len(ids), "hash collision in parameter ids"
    assert paramdoc.c4d_param_id("pota_camera", "fstop") in ids
    # balanced braces in the layout, stringtable has the node label
    assert res.count("{") == res.count("}")
    assert 'aitag_pota_camera   "Arnold pota_camera node";' in st


def test_json_schema_round_trips():
    schema = json.loads(paramdoc.render_json_schema())
    assert set(schema) == {"CameraConfig", "RenderConfig"}
    fstop = [r for r in schema["CameraConfig"] if r["name"] == "fstop"][0]
    assert fstop["min"] == 0.0 and fstop["default"] == 0.0


def test_groups_and_enable_when():
    """Every camera param belongs to a UI group and every enable-when rule
    references a real controlling parameter (the reference UI DSL's
    Group/Tab + conditional-disable structure, src/uigen.py:25-70)."""
    from pota_tpu.utils.paramdoc import (
        param_table, render_args, render_ae_template, render_mtd,
    )
    from pota_tpu.config import CameraConfig

    rows = param_table(CameraConfig)
    names = {r["name"] for r in rows}
    assert all("group" in r for r in rows)
    groups = {r["group"] for r in rows}
    assert {"Lens", "Aberrations", "Bokeh", "Bidirectional",
            "Advanced"} <= groups
    for r in rows:
        if "enable_when" in r:
            assert r["enable_when"]["param"] in names

    args = render_args()
    assert args.count("<group name=") >= 5
    assert 'conditionalVisOp="greaterThan"' in args
    assert 'conditionalVisPath="../bokeh_enable_image"' in args
    ae = render_ae_template()
    assert "DIM_RULES" in ae and "beginLayout" in ae
    assert ae.count("beginLayout") >= 5
    mtd = render_mtd()
    assert 'ui.group    STRING  "Bokeh"' in mtd
    assert "houdini.disable_when" in mtd
