"""PIP join & bbox-intersects join vs brute-force O(N*M) oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dxf_postgis_converter_spark.geometry.predicates import points_covered
from dxf_postgis_converter_spark.geometry.wkb import parse_wkb
from dxf_postgis_converter_spark.operators.spatial_join import (
    bbox_intersects_join, point_in_polygon_join,
)


@pytest.fixture(scope="module")
def points_df(entities_df):
    return entities_df.filter("geom_type = 'POINT'").select(
        "doc_id", "handle", F.col("xmin").alias("x"), F.col("ymin").alias("y")).cache()


@pytest.fixture(scope="module")
def zone_rings(zones_df):
    # full parsed geometry (all rings + MultiPolygon parts) — the corpus
    # now contains holed + multi zones and the oracle must honor them
    out = {}
    for r in zones_df.collect():
        code, geom = parse_wkb(bytes(r.geometry_wkb))
        out[r.zone_id] = geom
    return out


def brute_pip(points, zone_rings):
    pairs = set()
    px = np.array([p[2] for p in points])
    py = np.array([p[3] for p in points])
    for zid, geom in zone_rings.items():
        mask = points_covered(px, py, geom)
        for i in np.nonzero(mask)[0]:
            pairs.add((points[i][0], points[i][1], zid))
    return pairs


@pytest.mark.parametrize("res,n_salt,broadcast", [(6, 1, True), (8, 1, False), (6, 4, True), (7, 4, False)])
def test_pip_join_vs_bruteforce(points_df, zones_df, zone_rings, res, n_salt, broadcast):
    got = {(r.doc_id, r.handle, r.zone_id) for r in point_in_polygon_join(
        points_df, zones_df, res=res, n_salt=n_salt, broadcast_zones=broadcast,
        probe_id_col="handle").collect()}
    pts = [(r.doc_id, r.handle, r.x, r.y) for r in points_df.collect()]
    exp = brute_pip(pts, zone_rings)
    assert got == exp
    assert len(exp) > 50  # non-degenerate


def test_bbox_intersects_join_vs_bruteforce(entities_df, zones_df):
    probes = entities_df.filter("xmin is not null") \
        .select("doc_id", "handle", "xmin", "ymin", "xmax", "ymax")
    got = {(r.doc_id, r.handle, r.zone_id)
           for r in bbox_intersects_join(probes, zones_df, res=6).collect()}
    zb = [(r.zone_id, r.xmin, r.ymin, r.xmax, r.ymax) for r in zones_df.collect()]
    exp = set()
    for p in probes.collect():
        for zid, zx0, zy0, zx1, zy1 in zb:
            if p.xmin <= zx1 and p.xmax >= zx0 and p.ymin <= zy1 and p.ymax >= zy0:
                exp.add((p.doc_id, p.handle, zid))
    assert got == exp


def test_pip_join_per_row_wkb_fallback(monkeypatch, points_df, zones_df, zone_rings):
    """Huge-zone-set path: with the ring broadcast disabled (threshold 0)
    the wkb travels as a candidate column — rows must be identical to the
    broadcast-rings path and the brute-force oracle."""
    import dxf_postgis_converter_spark.operators.spatial_join as sj

    monkeypatch.setattr(sj, "MAX_RING_BROADCAST", 0)
    got = {(r.doc_id, r.handle, r.zone_id)
           for r in sj.point_in_polygon_join(points_df, zones_df, res=6).collect()}
    points = [(r.doc_id, r.handle, r.x, r.y) for r in points_df.collect()]
    assert got == brute_pip(points, zone_rings)
    assert len(got) > 0


def test_pip_join_holed_and_multipolygon_zones(spark):
    """A point strictly inside a hole is NOT covered; a point ON the hole
    boundary IS (shapely covers: the hole boundary belongs to the
    polygon); a MultiPolygon covers points in ANY of its parts."""
    from dxf_postgis_converter_spark.geometry.wkb import (
        wkb_multipolygon, wkb_polygon,
    )

    def rect(x0, y0, x1, y1):
        return np.array([[x0, y0, 0], [x1, y0, 0], [x1, y1, 0],
                         [x0, y1, 0], [x0, y0, 0]], dtype=float)

    zones = spark.createDataFrame(
        [("holed0", "holed", 0.0, 0.0, 100.0, 100.0,
          bytearray(wkb_polygon(rect(0, 0, 100, 100),
                                holes=[rect(30, 30, 70, 70)]))),
         ("multi0", "multi", 200.0, 200.0, 500.0, 500.0,
          bytearray(wkb_multipolygon([rect(200, 200, 280, 280),
                                      rect(420, 420, 500, 500)])))],
        "zone_id string, kind string, xmin double, ymin double, "
        "xmax double, ymax double, geometry_wkb binary")
    pts = spark.createDataFrame(
        [("p_in", 10.0, 10.0),        # inside outer, outside hole
         ("p_hole", 50.0, 50.0),      # strictly inside hole -> excluded
         ("p_hole_edge", 30.0, 50.0),  # ON hole boundary -> covered
         ("p_out", 150.0, 150.0),     # outside everything
         ("p_m1", 240.0, 240.0),      # in multi part 1
         ("p_m2", 460.0, 460.0),      # in multi part 2
         ("p_m_gap", 350.0, 350.0)],  # in multi bbox but between parts
        "handle string, x double, y double")
    for n_salt, broadcast in [(1, True), (4, False)]:
        got = {(r.handle, r.zone_id) for r in point_in_polygon_join(
            pts, zones, res=6, n_salt=n_salt, broadcast_zones=broadcast,
            probe_id_col="handle").collect()}
        assert got == {("p_in", "holed0"), ("p_hole_edge", "holed0"),
                       ("p_m1", "multi0"), ("p_m2", "multi0")}, (n_salt, got)


def test_corpus_has_holed_and_multi_zones(zones_df):
    kinds = {r.kind for r in zones_df.select("kind").distinct().collect()}
    assert {"holed", "multi"} <= kinds
