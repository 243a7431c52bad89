"""Area-selection predicate vs brute-force oracle on the same bboxes
(reference semantics: ezdxf.select bbox rules, area_selector.py:64-74)."""

import numpy as np
import pytest

from dxf_postgis_converter_spark.geometry.predicates import (
    circle_bbox_inside, circle_bbox_overlap, polygon_bbox_inside, polygon_bbox_overlap,
)
from dxf_postgis_converter_spark.operators.area_selection import (
    SelectionMode, ShapeType, SelectionRule, apply_selection_mode, select_handles,
    propagate_selection_up, select_entities,
)

RECT_ARGS = (1000.0, 3000.0, 1000.0, 3000.0)  # x_min, x_max, y_min, y_max (ref order)
CIRCLE_ARGS = ((2000.0, 2000.0), 800.0)
POLY_RING = [[500, 500], [3500, 700], [3000, 3500], [1800, 2200], [600, 3200]]


def brute(bboxes, shape, rule):
    out = []
    for h, (x0, y0, x1, y1) in bboxes:
        if shape == "rectangle":
            qx0, qx1, qy0, qy1 = RECT_ARGS
            overlap = x0 <= qx1 and x1 >= qx0 and y0 <= qy1 and y1 >= qy0
            inside = x0 >= qx0 and x1 <= qx1 and y0 >= qy0 and y1 <= qy1
        elif shape == "circle":
            (cx, cy), r = CIRCLE_ARGS
            overlap = circle_bbox_overlap(cx, cy, r, x0, y0, x1, y1)
            inside = circle_bbox_inside(cx, cy, r, x0, y0, x1, y1)
        else:
            overlap = polygon_bbox_overlap(np.array(POLY_RING, float), x0, y0, x1, y1)
            inside = polygon_bbox_inside(np.array(POLY_RING, float), x0, y0, x1, y1)
        keep = {"inside": inside, "intersect": overlap, "outside": not overlap}[rule]
        if keep:
            out.append(h.strip().lower())
    return sorted(set(out))


@pytest.fixture(scope="module")
def bboxes(entities_df):
    rows = entities_df.select("handle", "xmin", "ymin", "xmax", "ymax") \
        .filter("xmin is not null").collect()
    return [(r.handle, (r.xmin, r.ymin, r.xmax, r.ymax)) for r in rows]


@pytest.mark.parametrize("shape,args", [
    ("rectangle", RECT_ARGS),
    ("circle", CIRCLE_ARGS),
    ("polygon", (POLY_RING,)),
])
@pytest.mark.parametrize("rule", ["inside", "intersect", "outside"])
def test_select_handles_vs_bruteforce(entities_df, bboxes, shape, args, rule):
    got = sorted(r.handle for r in select_handles(entities_df, shape, rule, args).collect())
    exp = brute(bboxes, shape, rule)
    assert got == exp
    if rule == "intersect":
        assert len(exp) > 0  # non-degenerate scenario


def test_selection_modes(spark):
    prior = spark.createDataFrame([("a",), ("b",), ("c",)], "handle string")
    hits = spark.createDataFrame([("b",), ("d",)], "handle string")
    new = {r.handle for r in apply_selection_mode(prior, hits, SelectionMode.NEW).collect()}
    assert new == {"b", "d"}
    join = {r.handle for r in apply_selection_mode(prior, hits, SelectionMode.JOIN).collect()}
    assert join == {"a", "b", "c", "d"}
    sub = {r.handle for r in apply_selection_mode(prior, hits, SelectionMode.SUBTRACT).collect()}
    assert sub == {"a", "c"}


def test_propagation_up(spark):
    df = spark.createDataFrame(
        [("d1", "L1", True), ("d1", "L1", False), ("d1", "L2", False), ("d2", "L1", False)],
        "doc_id string, layer string, selected boolean")
    got = {(r.doc_id, r.layer): r.selected for r in propagate_selection_up(df).collect()}
    assert got == {("d1", "L1"): True, ("d1", "L2"): False, ("d2", "L1"): False}


def test_null_bbox_never_selected(entities_df):
    sel = select_entities(entities_df, ShapeType.RECTANGLE, SelectionRule.OUTSIDE,
                          (0.0, 1.0, 0.0, 1.0))
    assert sel.filter("xmin is null").count() == 0
