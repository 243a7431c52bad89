"""Golden tests for the ingest extraction contract
(sources/extractors.py ≙ reference dxf_reader.py:89-720) — executable
without ezdxf, so real-ingest parity is pinned before the library exists
in this environment."""

import math

import pytest

from dxf_postgis_converter_spark.sources.extractors import (
    BASE_ATTRIBUTE_DEFAULTS, EXTRACTORS, base_attributes, extract_geometries,
    flatten_spline, uniform_clamped_knots, vec3_to_list,
)


class FakeVec3:
    def __init__(self, x, y, z):
        self.x, self.y, self.z = x, y, z


def test_vec3_to_list():
    assert vec3_to_list(FakeVec3(1.0, 2.0, 3.0)) == [1.0, 2.0, 3.0]
    assert vec3_to_list([4, 5]) == [4, 5]  # non-vector passes through


def test_base_attribute_defaults_and_coercion():
    attrs, extra = base_attributes(
        {"layer": "Стены", "thickness": 2.5, "extrusion": FakeVec3(0, 0, 1),
         "style": object()},
        "TEXT")
    for k, v in BASE_ATTRIBUTE_DEFAULTS.items():
        assert attrs[k] == v  # guaranteed keys injected (dxf_reader.py:93-101)
    assert extra["dxftype"] == "TEXT"
    assert extra["dxf_attribs"]["extrusion"] == [0, 0, 1]  # vector → list
    assert isinstance(extra["dxf_attribs"]["style"], str)  # non-primitive → str
    assert "layer_dxf_attribs" not in extra  # no style table given


def test_base_attributes_layer_snapshot():
    styles = {"Стены": {"color": 112, "linetype": "DASHED", "lineweight": 18,
                        "plot": True, "true_color": None, "ltscale": 1.0}}
    _, extra = base_attributes({"layer": "Стены", "color": 256}, "LINE", styles)
    assert extra["layer_name"] == "Стены"
    snap = extra["layer_dxf_attribs"]
    assert snap == {"color": 112, "linetype": "DASHED", "lineweight": 18,
                    "plot": True, "ltscale": 1.0}  # None keys skipped


GOLDEN = {
    "POINT": ({"location": FakeVec3(1, 2, 3)}, {"location": [1, 2, 3]}),
    "LINE": ({"start": FakeVec3(0, 0, 0), "end": FakeVec3(1, 1, 0)},
             {"start": [0, 0, 0], "end": [1, 1, 0]}),
    "CIRCLE": ({"center": FakeVec3(5, 5, 0), "radius": 2.0},
               {"center": [5, 5, 0], "radius": 2.0}),
    "ARC": ({"center": FakeVec3(0, 0, 0), "radius": 1.0,
             "start_angle": 10.0, "end_angle": 200.0},
            {"center": [0, 0, 0], "radius": 1.0,
             "start_angle": 10.0, "end_angle": 200.0}),
    "RAY": ({"start": FakeVec3(1, 2, 3), "unit_vector": FakeVec3(0, 1, 0)},
            {"start": [1, 2, 3], "unit_vector": [0, 1, 0]}),
    "VIEWPORT": ({"center": FakeVec3(4, 4, 0), "width": 10.0, "height": 5.0},
                 {"center": [4, 4, 0], "width": 10.0, "height": 5.0}),
    "IMAGEDEF": ({"filename": "plan.png"}, {"filename": "plan.png"}),
    "DIMENSION": ({"anything": 1}, {}),  # stored as-is, no geometry
    "3DSOLID": ({"acis_data": "acis-blob"}, {"acis_data": "acis-blob"}),
}


@pytest.mark.parametrize("etype", sorted(GOLDEN))
def test_extraction_golden(etype):
    snapshot, expected = GOLDEN[etype]
    assert extract_geometries(etype, snapshot) == expected


def test_extractor_table_covers_reference_dispatch():
    # dxf_reader.py:152-183 — every type in the reference dispatch table
    ref = {"POINT", "LINE", "POLYLINE", "LWPOLYLINE", "CIRCLE", "ARC",
           "ELLIPSE", "SPLINE", "TEXT", "MTEXT", "INSERT", "MULTILEADER",
           "3DFACE", "SOLID", "TRACE", "3DSOLID", "BODY", "REGION", "MESH",
           "HATCH", "LEADER", "RAY", "XLINE", "ATTRIB", "SHAPE", "VIEWPORT",
           "IMAGE", "IMAGEDEF", "DIMENSION", "HELIX"}
    missing = ref - set(EXTRACTORS)  # incl. MULTILEADER since round 6:
    # the codec serializes the leader context (dxf_parser._b_multileader)
    assert not missing


def test_insert_attrib_rules():
    g = extract_geometries("INSERT", {
        "insert": FakeVec3(0, 0, 0), "name": "DOOR", "xscale": 2.0,
        "yscale": 2.0, "zscale": 1.0, "rotation": 90.0,
        "attribs": [{"tag": "NUM", "text": "D-1", "insert": FakeVec3(1, 1, 0)}]})
    assert g["name"] == "DOOR" and g["xscale"] == 2.0
    a = g["insert_attribs"][0]
    assert a["tag"] == "NUM" and a["text"] == "D-1" and a["insert"] == [1, 1, 0]
    assert a["height"] is None  # absent optional stays None (getattr default)


def test_hatch_polyline_and_edge_paths():
    g = extract_geometries("HATCH", {
        "pattern_name": "SOLID", "solid_fill": True,
        "paths": [
            {"vertices": [(0, 0), (1, 0), (1, 1)], "is_closed": True},
            {"edges": [
                {"start": FakeVec3(0, 0, 0), "end": FakeVec3(1, 0, 0)},
                {"center": FakeVec3(1, 1, 0), "radius": 1.0,
                 "start_angle": 0.0, "end_angle": 90.0},
            ]},
        ]})
    # 2-tuples stay 2d, 3-tuples 3d (dxf_reader.py:562-570)
    assert g["boundaries"] == [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]]
    assert g["hatch_paths"][0]["path_type"] == "polyline"
    assert g["hatch_paths"][0]["is_closed"] is True
    edges = g["hatch_paths"][1]["edges"]
    assert edges[0] == {"edge_type": "line", "start": [0, 0, 0], "end": [1, 0, 0]}
    assert edges[1]["edge_type"] == "arc" and edges[1]["ccw"] is True


# --- SPLINE flattening goldens (C10 seam, dxf_reader.py:280) ----------------

CPS = [(0, 0, 0), (1, 2, 0), (3, 3, 0), (5, 1, 0), (7, 2, 0), (8, 0, 0)]


def test_spline_flattening_golden():
    pts = flatten_spline(CPS, degree=3, distance=0.01)
    # pinned output shape for the fixed fixture
    assert len(pts) == 28
    assert pts[0] == [0.0, 0.0, 0.0] and pts[-1] == [8.0, 0.0, 0.0]
    # pinned regression sample (falls on a bisection node of the fixture)
    mid = pts[len(pts) // 2]
    assert mid[0] == pytest.approx(4.0, abs=1e-9)
    assert mid[1] == pytest.approx(2.0, abs=1e-9)


def test_spline_flattening_tolerance_contract():
    """Every curve midpoint sampled densely must lie within the distance
    tolerance of the emitted polyline (the flattening(0.01) guarantee)."""
    from dxf_postgis_converter_spark.sources.extractors import _deboor

    tol = 0.01
    pts = flatten_spline(CPS, degree=3, distance=tol)
    knots = uniform_clamped_knots(len(CPS), 3)

    def seg_dist(p, a, b):
        ax, ay = a[0], a[1]
        vx, vy = b[0] - ax, b[1] - ay
        wx, wy = p[0] - ax, p[1] - ay
        vv = vx * vx + vy * vy
        t = max(0.0, min(1.0, (wx * vx + wy * vy) / vv)) if vv else 0.0
        return math.hypot(p[0] - (ax + t * vx), p[1] - (ay + t * vy))

    for i in range(1, 400):
        t = i / 400.0
        p = _deboor(knots, [tuple(map(float, c)) for c in CPS], 3, t)
        d = min(seg_dist(p, pts[j], pts[j + 1]) for j in range(len(pts) - 1))
        assert d <= tol * 1.5  # small slack: tolerance is checked at midpoints


def test_spline_fewer_points_than_degree_passthrough():
    assert flatten_spline([(0, 0), (1, 1)], degree=3) == [
        [0.0, 0.0, 0.0], [1.0, 1.0, 0.0]]
