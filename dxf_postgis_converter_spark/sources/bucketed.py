"""Bucketed co-located joins (SURVEY §4.3 "bucketing for co-located
joins"): write both sides bucketed + sorted on the join key, and the
equi-join plans with ZERO exchanges — at 10^12 rows that's the
difference between a petabyte shuffle and a local merge per bucket.

Parquet bucketed tables go through the session catalog
(``bucketBy().sortBy().saveAsTable``); on a production cluster the same
calls target the shared metastore / Iceberg bucket transform. The
assertion that the shuffle actually disappears lives in
tests/test_bucketed.py (plan contains no Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16,
                   mode: str = "overwrite") -> None:
    """Persist df bucketed+sorted by the join key (one sorted file set per
    bucket → merge-joinable without exchange or sort)."""
    df.write.format("parquet").mode(mode) \
        .bucketBy(n_buckets, key).sortBy(key).saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Catalyst plans SortMergeJoin with no Exchange on either
    side (verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
