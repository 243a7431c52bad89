"""Bucketed co-located join: the shuffle must actually disappear."""

import pyspark.sql.functions as F
import pytest

from dxf_postgis_converter_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, entities_df):
    left = entities_df.select("doc_id", "handle", "entity_type", "layer")
    right = (entities_df.groupBy("doc_id")
             .agg(F.count("*").alias("n_entities")))
    write_bucketed(left, "ents_bkt", "doc_id", n_buckets=8)
    write_bucketed(right, "docstats_bkt", "doc_id", n_buckets=8)
    yield "ents_bkt", "docstats_bkt"
    spark.sql("DROP TABLE IF EXISTS ents_bkt")
    spark.sql("DROP TABLE IF EXISTS docstats_bkt")


def test_join_has_no_exchange(spark, bucketed_tables):
    l, r = bucketed_tables
    # force the non-broadcast strategy (at 10^12 rows neither side fits);
    # with matching bucket specs the SMJ needs no exchange at all
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, l, r, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: no shuffle on either side
    assert plan.count("Bucketed: true") == 2


def test_join_result_correct(spark, bucketed_tables, entities_df):
    l, r = bucketed_tables
    got = bucketed_join(spark, l, r, "doc_id")
    assert got.count() == entities_df.count()
    one = got.groupBy("doc_id", "n_entities").count().filter(
        F.col("n_entities") != F.col("count"))
    assert one.count() == 0
