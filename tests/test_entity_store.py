"""Cell-prefix partitioned store: pruning actually happens (plan-level
PartitionFilters) and scoped reads return exactly the right rows."""

import pyspark.sql.functions as F
import pytest

from dxf_postgis_converter_spark.sources.entity_store import (
    read_entities,
    read_entities_bbox,
    with_cell_prefix,
    write_entities,
)


@pytest.fixture(scope="module")
def store(spark, entities_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ents") / "store")
    write_entities(entities_df, path)
    return path


def test_roundtrip_row_count(spark, entities_df, store):
    assert read_entities(spark, store).count() == entities_df.count()


def test_geometryless_rows_preserved(spark, entities_df, store):
    got = read_entities(spark, store).filter("cell_p = -1").count()
    want = entities_df.filter(F.col("xmin").isNull()).count()
    assert got == want > 0


def test_bbox_read_matches_bruteforce(spark, entities_df, store):
    q = (1000.0, 1000.0, 2000.0, 2000.0)
    got = read_entities_bbox(spark, store, *q).select("handle")
    want = entities_df.filter(
        (F.col("xmin") <= q[2]) & (F.col("xmax") >= q[0])
        & (F.col("ymin") <= q[3]) & (F.col("ymax") >= q[1])).select("handle")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_partition_pruning_in_plan(spark, store):
    df = read_entities_bbox(spark, store, 1000.0, 1000.0, 1100.0, 1100.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruning predicate on cell_p must be present and non-trivial
    start = plan.index("PartitionFilters: [")
    seg = plan[start:start + 300]
    assert "cell_p" in seg


def test_prefix_assignment_consistent(entities_df):
    tagged = with_cell_prefix(entities_df)
    # every geometry row lands in a valid res-3 cell, others in -1
    bad = tagged.filter(
        (F.col("xmin").isNotNull() & ((F.col("cell_p") < 0)
         | (F.shiftright(F.col("cell_p"), 58) != 3)))
        | (F.col("xmin").isNull() & (F.col("cell_p") != -1)))
    assert bad.count() == 0
