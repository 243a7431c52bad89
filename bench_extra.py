"""Round-8 optimization harness — decomposition timings + plan capture.

NOT the driver bench (bench.py is frozen): this file isolates each bench
stage's sub-steps with the noop sink (guide §1.4) so optimization work is
attributed to the right operator, and dumps .explain("formatted") for the
stages under plans/r08/.

Usage:
  python bench_extra.py [step ...]     # default: all steps
Env: same as bench.py (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dxf_postgis_converter_spark.corpus import ensure_corpus
from dxf_postgis_converter_spark.functions.decode import decode_documents, text_spans
from dxf_postgis_converter_spark.operators.area_selection import select_handles
from dxf_postgis_converter_spark.operators.dedup import minhash_lsh_pairs, word_shingles
from dxf_postgis_converter_spark.operators.knn import knn_join
from dxf_postgis_converter_spark.operators.similarity import brute_force_topk
from dxf_postgis_converter_spark.operators.spatial_join import point_in_polygon_join
from dxf_postgis_converter_spark.operators.tiles import tile_pyramid_counts
from dxf_postgis_converter_spark.operators.insert_expand import expand_inserts
from dxf_postgis_converter_spark.operators.reconstruct import (
    rebuild_media_refs, reconstruct_documents)
from dxf_postgis_converter_spark.session import get_spark
from dxf_postgis_converter_spark.sources.entity_store import INTERMEDIATE_CODEC
from dxf_postgis_converter_spark.sources.tables import load_table, sf_of_dir

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WORK = os.environ.get("BENCH_WORK_DIR", "/root/repo/data/bench_work")
REPEATS = int(os.environ.get("BENCH_REPEATS", "2"))

STEPS = set(sys.argv[1:])


def want(name: str) -> bool:
    return not STEPS or name in STEPS or any(name.startswith(s) for s in STEPS)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


T: dict[str, list[float]] = {}


def timed(name, fn, n=REPEATS):
    spark = None
    for _ in range(n):
        t0 = time.time()
        fn()
        T.setdefault(name, []).append(round(time.time() - t0, 3))
    print(f"{name:40s} {T[name]}", flush=True)


def dump_plan(df, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def main():
    sf = sf_of_dir(SF_DIR)
    corpus_sf = float(os.environ.get("SPARK_GRAFT_CORPUS_SF") or sf)
    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]")
    corpus = ensure_corpus(spark, corpus_sf)
    docs = spark.read.parquet(os.path.join(corpus, "documents"))
    zones = spark.read.parquet(os.path.join(corpus, "zones"))
    docs.count()

    ents_path = os.path.join(WORK, "entities")
    if not os.path.exists(ents_path):
        decode_documents(docs, keep_media_ref=False) \
            .write.mode("overwrite") \
            .option("compression", INTERMEDIATE_CODEC).parquet(ents_path)
    ents = spark.read.parquet(ents_path)
    pts = ents.filter(F.col("geom_type") == "POINT").select(
        "doc_id", "handle",
        F.col("xmin").alias("x"), F.col("ymin").alias("y"))

    sc = spark.sparkContext

    # ---- decode decomposition -------------------------------------------
    if want("decode"):
        sc.setJobDescription("decode: noop (compute only)")
        timed("decode_noop", lambda: _force(
            decode_documents(docs, keep_media_ref=False)))
        sc.setJobDescription("decode: parquet write (codec=%s)" % INTERMEDIATE_CODEC)
        timed("decode_write_" + INTERMEDIATE_CODEC,
              lambda: decode_documents(docs, keep_media_ref=False)
              .write.mode("overwrite")
              .option("compression", INTERMEDIATE_CODEC)
              .parquet(os.path.join(WORK, "ents_codec_test")))
        # JVM-side-only cost: explode+filter+count without the Python stage
        sc.setJobDescription("decode: explode/filter only (JVM)")
        spans = docs.select("doc_id", F.explode("spans").alias("span")) \
            .filter(F.col("span.kind") == "media") \
            .select("doc_id", F.col("span.media_ref").alias("media_ref"),
                    F.col("span.offset").alias("offset"))
        timed("decode_jvm_explode_only", lambda: _force(spans))

    # ---- entities scan cost (paid by every downstream stage) ------------
    if want("scan"):
        sc.setJobDescription("scan: full entities noop")
        timed("ents_scan_full", lambda: _force(ents))
        sc.setJobDescription("scan: narrow cols noop")
        timed("ents_scan_narrow", lambda: _force(
            ents.select("doc_id", "handle", "geom_type", "xmin", "ymin")))

    # ---- knn decomposition ----------------------------------------------
    if want("knn"):
        all_pts = pts.select(F.col("handle").alias("target_id"), "x", "y")
        probes = pts.limit(2000).select(
            F.col("handle").alias("probe_id"), "x", "y")
        os.environ["SPARK_GRAFT_KNN_DEBUG"] = "1"
        import importlib
        import dxf_postgis_converter_spark.operators.knn as knn_mod
        importlib.reload(knn_mod)
        sc.setJobDescription("knn: full (auto)")
        timed("knn_auto_2000", lambda: _force(
            knn_mod.knn_join(probes, all_pts, k=5, res=7)))
        sc.setJobDescription("knn: probe count only")
        timed("knn_probe_count", lambda: probes.count())
        sc.setJobDescription("knn: target persist+density")
        def density():
            t = all_pts.select("target_id", F.col("x").alias("t_x"),
                               F.col("y").alias("t_y")).persist()
            t.groupBy().count().collect()
            t.unpersist()
        timed("knn_target_materialize", density)
        os.environ.pop("SPARK_GRAFT_KNN_DEBUG", None)

    # ---- reconstruct decomposition --------------------------------------
    if want("reconstruct"):
        sc.setJobDescription("reconstruct: rebuild refs only (Python stage)")
        timed("reconstruct_rebuild_only", lambda: _force(
            rebuild_media_refs(ents)))
        sc.setJobDescription("reconstruct: full")
        timed("reconstruct_full", lambda: _force(
            reconstruct_documents(ents, text_spans(docs))))
        sc.setJobDescription("reconstruct: data_json scan only")
        timed("reconstruct_scan_only", lambda: _force(
            ents.select("doc_id", "span_offset", "data_json")))

    # ---- minhash decomposition ------------------------------------------
    if want("minhash"):
        tdocs = load_table(spark, SF_DIR, "documents")
        tdocs.count()
        src = tdocs.select("doc_id", "text")
        sc.setJobDescription("minhash: full")
        timed("minhash_full", lambda: _force(
            minhash_lsh_pairs(tdocs, num_hashes=64, bands=16,
                              jaccard_threshold=0.7)))
        sc.setJobDescription("minhash: shingles only")
        base = src.repartition(64, F.col("doc_id")).select(
            "doc_id", word_shingles(F.col("text"), 3).alias("_grams"))
        timed("minhash_shingles_only", lambda: _force(base))
        sc.setJobDescription("minhash: sig agg only")
        eg = base.select("doc_id", F.explode("_grams").alias("_g")) \
            .select("doc_id", F.xxhash64("_g").alias("_gh"))
        sig = (eg.groupBy("doc_id")
               .agg(*[F.min(F.xxhash64(F.lit(k), "_gh")).alias(f"_h{k}")
                      for k in range(64)]))
        timed("minhash_sig_only", lambda: _force(sig))

    # ---- pip decomposition ----------------------------------------------
    if want("pip"):
        sc.setJobDescription("pip: full broadcast")
        timed("pip_full", lambda: _force(
            point_in_polygon_join(pts, zones, res=6)
            .groupBy("zone_id").agg(F.count("*").alias("n"))))
        sc.setJobDescription("pip: probe scan only")
        timed("pip_probe_scan", lambda: _force(pts))

    # ---- others ----------------------------------------------------------
    if want("tiles"):
        sc.setJobDescription("tiles: full")
        timed("tile_pyramid", lambda: _force(
            tile_pyramid_counts(ents.filter(F.col("xmin").isNotNull()),
                                z_max=8, z_min=4)))
    if want("area"):
        sc.setJobDescription("area: full")
        timed("area_select", lambda: _force(
            select_handles(ents.filter(F.col("xmin").isNotNull()),
                           "circle", "intersect", ((4000.0, 4000.0), 1500.0))))
    if want("insert"):
        sc.setJobDescription("insert_expand: full")
        timed("insert_expand", lambda: _force(expand_inserts(ents)))
    if want("ann"):
        emb = load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        qs = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))
        sc.setJobDescription("ann: full")
        timed("ann_topk", lambda: _force(
            brute_force_topk(emb.filter(F.col("vec_id") >= 8), qs, k=10)))

    print(json.dumps({k: min(v) for k, v in T.items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
