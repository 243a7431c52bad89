"""Dump .explain('formatted') for every bench stage → plans/r08/<stage>_<tag>.txt.

Usage: python scripts/dump_plans_r08.py <tag>     (tag = before|after)
Run from a checkout of the code whose plans you want; data paths are
absolute so the round-start worktree produces comparable plans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = os.environ.get("PLANS_OUT", "/root/repo/plans/r08")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS = os.environ.get("PLANS_CORPUS", "/root/repo/data/corpus/sf0.1")
ENTS = os.environ.get("PLANS_ENTS", "/root/repo/data/bench_work/entities")


def main():
    from dxf_postgis_converter_spark.functions.decode import (
        decode_documents, text_spans)
    from dxf_postgis_converter_spark.operators.area_selection import select_handles
    from dxf_postgis_converter_spark.operators.dedup import minhash_lsh_pairs
    from dxf_postgis_converter_spark.operators.insert_expand import expand_inserts
    from dxf_postgis_converter_spark.operators.knn import knn_join
    from dxf_postgis_converter_spark.operators.reconstruct import (
        reconstruct_documents)
    from dxf_postgis_converter_spark.operators.similarity import brute_force_topk
    from dxf_postgis_converter_spark.operators.spatial_join import (
        point_in_polygon_join)
    from dxf_postgis_converter_spark.operators.tiles import tile_pyramid_counts
    from dxf_postgis_converter_spark.session import get_spark
    from dxf_postgis_converter_spark.sources.tables import load_table

    spark = get_spark(app_name="plans_r08", master="local[4]")
    os.makedirs(OUT, exist_ok=True)
    docs = spark.read.parquet(os.path.join(CORPUS, "documents"))
    zones = spark.read.parquet(os.path.join(CORPUS, "zones"))
    ents = spark.read.parquet(ENTS)
    pts = ents.filter(F.col("geom_type") == "POINT").select(
        "doc_id", "handle", F.col("xmin").alias("x"), F.col("ymin").alias("y"))

    def dump(name, df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print("dumped", name)

    dump("decode", decode_documents(docs, keep_media_ref=False))
    dump("pip_join", point_in_polygon_join(pts, zones, res=6)
         .groupBy("zone_id").agg(F.count("*").alias("n")))
    dump("pip_join_salted",
         point_in_polygon_join(pts, zones, res=6, broadcast_zones=False,
                               n_salt=8)
         .groupBy("zone_id").agg(F.count("*").alias("n")))
    dump("tile_pyramid", tile_pyramid_counts(
        ents.filter(F.col("xmin").isNotNull()), z_max=8, z_min=4))
    dump("area_select", select_handles(
        ents.filter(F.col("xmin").isNotNull()),
        "circle", "intersect", ((4000.0, 4000.0), 1500.0)))
    dump("reconstruct", reconstruct_documents(ents, text_spans(docs)))
    dump("insert_expand", expand_inserts(ents))
    tdocs = load_table(spark, SF_DIR, "documents")
    dump("minhash_lsh", minhash_lsh_pairs(
        tdocs, num_hashes=64, bands=16, jaccard_threshold=0.7))
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    dump("ann_topk", brute_force_topk(emb.filter(F.col("vec_id") >= 8), qs, k=10))
    # knn is driver-iterative: the final plan is what the caller executes.
    probes = pts.limit(2000).select(F.col("handle").alias("probe_id"), "x", "y")
    all_pts = pts.select(F.col("handle").alias("target_id"), "x", "y")
    dump("knn_join", knn_join(probes, all_pts, k=5, res=7))
    spark.stop()


if __name__ == "__main__":
    main()
