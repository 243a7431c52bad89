"""Reproduce the r6 ANN scale measurements recorded in BASELINE.md.

Two experiments over deterministic synthetic vectors (xxhash64-derived,
no RNG, layout-independent):

1. banded embedding LSH at ~101k vectors (dim 32): 1000 seeded
   near-dups (cosine ≈ 0.9995) among uniform noise — reports wall,
   seeded-pair recall, and false-pair count (expected: 1000/1000, 0).
2. ivf_topk query-path A/B at 10k queries × 200k corpus (512 centroids,
   n_probe 4): identical rows from both paths; reports both walls.
   Candidate volume ≈ |Q|·n_probe·|corpus|/C — keep C scaled to the
   query set (C=64 at 50k queries is a ~625M-row join; see the
   ivf_topk docstring sizing note).

Run: SPARK_GRAFT_LOCAL_DIR=/root/repo/data/spark_local \
     python scripts/measure_ann_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dxf_postgis_converter_spark.operators.dedup import (  # noqa: E402
    embedding_neardup_pairs,
)
from dxf_postgis_converter_spark.operators.similarity import (  # noqa: E402
    ivf_topk, kmeans_centroids,
)
from dxf_postgis_converter_spark.session import get_spark  # noqa: E402


def _vectors(spark, lo, n, idname, vecname, dim=32):
    return spark.range(lo, lo + n).select(
        F.col("id").alias(idname),
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: (F.pmod(F.xxhash64(F.col("id") * 37 + j),
                                      F.lit(100000)) / 50000.0 - 1.0)
                    ).alias(vecname))


def main() -> None:
    spark = get_spark(master="local[32]", shuffle_partitions=64)

    # 1. banded LSH recall at scale
    n, seeded = 100_000, 1000
    base = _vectors(spark, 0, n, "vec_id", "embedding")
    dups = base.filter(F.col("vec_id") < seeded).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.999 + 0.0003).alias("embedding"))
    emb = base.unionByName(dups).cache()
    emb.count()
    t0 = time.time()
    pairs = embedding_neardup_pairs(emb, threshold=0.95).cache()
    n_pairs = pairs.count()
    wall = time.time() - t0
    found = pairs.filter((F.col("id_b") - F.col("id_a")) == 10_000_000).count()
    print(f"banded_lsh: vectors={n + seeded} pairs={n_pairs} "
          f"seeded_recall={found}/{seeded} false={n_pairs - found} "
          f"wall={wall:.1f}s")

    # 2. ivf query-path A/B
    corpus = _vectors(spark, 0, 200_000, "vec_id", "embedding").cache()
    corpus.count()
    qs = _vectors(spark, 5_000_000, 10_000, "query_id", "query_vec").cache()
    qs.count()
    cents = kmeans_centroids(corpus, 512)
    rows = {}
    for path in ("distributed", "driver"):
        t0 = time.time()
        rows[path] = ivf_topk(corpus, qs, k=10, centroids=cents,
                              n_probe=4, query_path=path).count()
        print(f"ivf_{path}: rows={rows[path]} wall={time.time() - t0:.1f}s")
    assert rows["distributed"] == rows["driver"]
    spark.stop()


if __name__ == "__main__":
    main()
