"""Table loaders: driver testdata parquet + the generated corpus.

At cluster scale these would be Iceberg catalog tables (documents
partitioned by bucket(doc_id), entities by cell prefix — SURVEY §4.4);
in this sandbox they are parquet directories read through the same
DataFrame API, so every downstream plan is identical.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def sf_of_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


def corpus_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..corpus import load_documents

    return load_documents(spark, sf_of_dir(sf_dir))


def corpus_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..corpus import load_zones

    return load_zones(spark, sf_of_dir(sf_dir))
