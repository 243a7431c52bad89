"""Cell-prefix partitioned entity store (SURVEY §4.4: "derived entities
written with cell prefix partitioning").

Layout: one partition directory per coarse cell (``cell_p`` = quadtree
cell at ``prefix_res``), so spatially-scoped reads — area selections,
PIP probes against a zone's neighbourhood, tile renders — prune whole
partitions at planning time (Catalyst ``PartitionFilters``) instead of
scanning 10^12 rows. ``prefix_res`` 3 → ≤64 directories, 4 → ≤256; pick
so each partition is 10s of GB at target scale (repartition before write
keeps one file per partition instead of files × tasks).

Geometry-less entities (DIMENSION, 3DSOLID, …) land in the reserved
``cell_p = -1`` partition, so nothing is dropped and non-spatial readers
still see every row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.grid import cell_col

DEFAULT_PREFIX_RES = 3  # 8x8 grid → at most 64 + 1 partitions

# Intermediate materializations (the entities table is re-read by every
# downstream stage, then superseded) default to lz4: measured 4.5s vs
# 26s (zstd, contended) / ~8.5s (zstd, quiet) for the sf0.1 decode write
# at +33% size — write throughput beats storage for short-lived tables.
# Final/exported tables keep the session-level zstd default (session.py).
import os as _os

INTERMEDIATE_CODEC = _os.environ.get("SPARK_GRAFT_INTERMEDIATE_CODEC", "lz4")


def with_cell_prefix(entities: DataFrame, prefix_res: int = DEFAULT_PREFIX_RES) -> DataFrame:
    """Add the partition column: coarse cell of the bbox centre
    (geometry-less rows → -1)."""
    cx = (F.col("xmin") + F.col("xmax")) / 2
    cy = (F.col("ymin") + F.col("ymax")) / 2
    return entities.withColumn(
        "cell_p",
        F.when(F.col("xmin").isNull(), F.lit(-1).cast("long"))
        .otherwise(cell_col(cx, cy, prefix_res)))


def write_entities(entities: DataFrame, path: str,
                   prefix_res: int = DEFAULT_PREFIX_RES, mode: str = "overwrite") -> None:
    """Write partitioned by cell prefix; repartition on the partition
    column first so each partition directory gets one writer (without it
    every task writes a file into every partition → tasks × partitions
    small files, the classic 10^12-row write mistake)."""
    with_cell_prefix(entities, prefix_res) \
        .repartition(F.col("cell_p")) \
        .write.mode(mode).partitionBy("cell_p") \
        .option("compression", INTERMEDIATE_CODEC).parquet(path)


def read_entities(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_entities_bbox(spark: SparkSession, path: str,
                       xmin: float, ymin: float, xmax: float, ymax: float,
                       prefix_res: int = DEFAULT_PREFIX_RES) -> DataFrame:
    """Spatially-scoped read: partition-prunes to the prefix cells the
    query bbox covers, then row-filters exactly. The cell_p predicate is
    a literal IN-list → lands in Catalyst's PartitionFilters."""
    from ..index.grid import covers_py

    cells = covers_py(xmin, ymin, xmax, ymax, prefix_res)
    df = spark.read.parquet(path)
    return df.filter(F.col("cell_p").isin(cells)).filter(
        (F.col("xmin") <= xmax) & (F.col("xmax") >= xmin)
        & (F.col("ymin") <= ymax) & (F.col("ymax") >= ymin))
