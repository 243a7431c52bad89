"""spark-submit entry point: training-data preparation pipeline.

Composes the engine's text/dedup operators into the standard cleaning
flow over a documents table (doc_id, text, lang, source, n_chars):

  1. quality + language filtering        (functions/text.py — JVM exprs)
  2. exact dedup                          (hash-groupBy keep-min)
  3. MinHash+LSH near-dedup               (keep the min id per dup pair
                                           component, 1-hop approximation)
  4. token accounting report

Run: spark-submit --py-files dist/dxf_postgis_converter_spark.zip \
       scripts/job_dataprep.py --input /root/testdata/sf0.01 --out /tmp/prep
Prints one JSON line per stage + a final funnel summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/dataprep_out")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--langs", default="en,ru")
    ap.add_argument("--jaccard", type=float, default=0.8)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("dataprep").getOrCreate()
    from dxf_postgis_converter_spark.functions.text import (
        lang_id, quality_score, token_count,
    )
    from dxf_postgis_converter_spark.operators.dedup import (
        dedup_exact, minhash_lsh_pairs,
    )

    docs = spark.read.parquet(os.path.join(args.input, "documents.parquet"))
    n0 = docs.count()

    # 1. quality + language gate (pure column expressions)
    langs = args.langs.split(",")
    kept = docs.withColumn("quality", quality_score(F.col("text"))) \
        .withColumn("lang_pred", lang_id(F.col("text"))) \
        .filter((F.col("quality") >= args.min_quality) & F.col("lang_pred").isin(langs))
    n1 = kept.count()
    print(json.dumps({"stage": "quality_lang_filter", "in": n0, "out": n1}))

    # 2. exact dedup
    exact = dedup_exact(kept)
    n2 = exact.count()
    print(json.dumps({"stage": "exact_dedup", "in": n1, "out": n2}))

    # 3. near-dedup: drop the larger id of every confident near-dup pair
    pairs = minhash_lsh_pairs(exact, jaccard_threshold=args.jaccard)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    clean = exact.join(drop, "doc_id", "left_anti")
    n3 = clean.count()
    print(json.dumps({"stage": "near_dedup", "in": n2, "out": n3,
                      "pairs": pairs.count()}))

    # 4. persist + token accounting
    clean.write.mode("overwrite").parquet(os.path.join(args.out, "clean"))
    report = clean.agg(
        F.count("*").alias("docs"),
        F.sum(token_count(F.col("text"))).alias("tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality")).first()
    print(json.dumps({"status": "ok", "input_docs": n0, "clean_docs": n3,
                      "tokens": report.tokens, "avg_quality": report.avg_quality,
                      "retention": round(n3 / n0, 4)}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
