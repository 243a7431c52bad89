"""Grid index: Spark column algebra vs the pure-Python mirror."""

import numpy as np
from pyspark.sql import functions as F

from dxf_postgis_converter_spark.index.grid import (
    EXTENT, cell_col, cell_id_py, cell_ix, cell_iy, cell_res, cell_size,
    children_col, covers_col, covers_py, k_ring_col, parent_col,
)


def test_cell_col_matches_python(spark):
    rng = np.random.default_rng(1)
    pts = [(float(x), float(y)) for x, y in rng.uniform(0, EXTENT, size=(200, 2))]
    df = spark.createDataFrame(pts, "x double, y double")
    for res in (3, 7, 12):
        got = [r[0] for r in df.select(cell_col(F.col("x"), F.col("y"), res)).collect()]
        exp = [cell_id_py(x, y, res) for x, y in pts]
        assert got == exp


def test_cell_decode_fields(spark):
    df = spark.createDataFrame([(100.0, 200.0)], "x double, y double")
    res = 9
    row = df.select(
        cell_res(cell_col(F.col("x"), F.col("y"), res)).alias("r"),
        cell_ix(cell_col(F.col("x"), F.col("y"), res)).alias("ix"),
        cell_iy(cell_col(F.col("x"), F.col("y"), res)).alias("iy"),
    ).first()
    s = cell_size(res)
    assert row.r == res and row.ix == int(100.0 // s) and row.iy == int(200.0 // s)


def test_covers_matches_python(spark):
    df = spark.createDataFrame([(10.0, 20.0, 300.0, 250.0)], "xmin double, ymin double, xmax double, ymax double")
    for res in (4, 6, 8):
        got = df.select(covers_col(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), res)).first()[0]
        exp = covers_py(10.0, 20.0, 300.0, 250.0, res)
        assert sorted(got) == sorted(exp)


def test_k_ring_counts_and_membership(spark):
    df = spark.createDataFrame([(4000.0, 4000.0)], "x double, y double")
    res = 8
    cell = df.select(cell_col(F.col("x"), F.col("y"), res).alias("c"))
    for k in (1, 2, 3):
        ring = cell.select(k_ring_col(F.col("c"), k).alias("r")).first()[0]
        assert len(ring) == (2 * k + 1) ** 2  # interior cell, no clipping
        assert cell.first()[0] in ring
    # border cell clips + dedups
    edge = spark.createDataFrame([(0.0, 0.0)], "x double, y double") \
        .select(k_ring_col(cell_col(F.col("x"), F.col("y"), res), 1).alias("r")).first()[0]
    assert len(edge) == 4


def test_parent_children_roundtrip(spark):
    df = spark.createDataFrame([(1234.5, 777.25)], "x double, y double")
    res = 10
    c = df.select(cell_col(F.col("x"), F.col("y"), res).alias("c"))
    parent = c.select(parent_col(F.col("c")).alias("p"))
    # parent equals direct assignment at res-1
    direct = df.select(cell_col(F.col("x"), F.col("y"), res - 1).alias("p"))
    assert parent.first()[0] == direct.first()[0]
    # cell is among its parent's children
    kids = parent.select(children_col(F.col("p")).alias("k")).first()[0]
    assert c.first()[0] in kids and len(kids) == 4
