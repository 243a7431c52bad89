import numpy as np

from dxf_postgis_converter_spark.geometry.wkb import (
    LINESTRING_Z, MULTIPOLYGON_Z, POINT_Z, POLYGON_Z,
    parse_wkb, wkb_bbox, wkb_linestring, wkb_multipolygon, wkb_point, wkb_polygon,
)


def test_point_roundtrip():
    b = wkb_point(1.5, -2.25, 3.0)
    code, a = parse_wkb(b)
    assert code == POINT_Z
    assert a.tolist() == [[1.5, -2.25, 3.0]]
    assert wkb_bbox(b) == (1.5, -2.25, 1.5, -2.25)


def test_linestring_roundtrip():
    pts = [(0, 0, 0), (1, 2, 3), (4, 5, 6)]
    code, a = parse_wkb(wkb_linestring(pts))
    assert code == LINESTRING_Z
    assert a.tolist() == [list(map(float, p)) for p in pts]


def test_polygon_ring_closure():
    # open ring → closed on encode (shapely behaviour)
    pts = [(0, 0, 0), (4, 0, 0), (4, 4, 0), (0, 4, 0)]
    code, rings = parse_wkb(wkb_polygon(pts))
    assert code == POLYGON_Z
    assert len(rings) == 1
    assert rings[0].shape == (5, 3)
    assert rings[0][0].tolist() == rings[0][-1].tolist()
    # already-closed ring stays as-is
    closed = pts + [pts[0]]
    _, rings2 = parse_wkb(wkb_polygon(closed))
    assert rings2[0].shape == (5, 3)


def test_multipolygon():
    p1 = [(0, 0, 0), (1, 0, 0), (1, 1, 0)]
    p2 = [(5, 5, 0), (9, 5, 0), (9, 9, 1), (5, 9, 0)]
    b = wkb_multipolygon([np.array(p1, float), np.array(p2, float)])
    code, polys = parse_wkb(b)
    assert code == MULTIPOLYGON_Z
    assert len(polys) == 2
    assert wkb_bbox(b) == (0.0, 0.0, 9.0, 9.0)
