"""spark-submit entry point: the full checkpointed spatial pipeline.

Deployment shape required by the north_rule — ``spark-submit --py-files
dist/dxf_postgis_converter_spark.zip scripts/job_spatial_pipeline.py`` —
so the package must be importable from the zip alone (no repo checkout on
executors). scripts/submit.sh builds the zip and invokes spark-submit;
the same command line works unchanged against a cluster master.

Stages (each lineage-checkpointed, idempotently resumable):
  decode         documents → entities parquet
  pip            entities(points) ⋈ zones → per-zone counts
  tiles          tile pyramid z8→z4
  export         every document back out as real .dxf bytes
  contamination  13-gram benchmark-contamination sweep over doc text

Prints one JSON line per stage + a final summary line.
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
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--out", default="/tmp/spatial_pipeline_out")
    ap.add_argument("--snapshot", default=None,
                    help="override the lineage snapshot tag; by default the "
                         "documents are committed to a snapshot-versioned "
                         "table and its REAL manifest snapshot_id keys the "
                         "lineage (north_rule: per-partition lineage = "
                         "(Iceberg snapshot id, partition hash, row counts))")
    ap.add_argument("--n-buckets", type=int, default=16)
    args = ap.parse_args()

    # import AFTER SparkSession exists so the zip on --py-files resolves
    spark = SparkSession.builder.appName("spatial-pipeline").getOrCreate()
    from dxf_postgis_converter_spark.corpus import load_documents, load_zones
    from dxf_postgis_converter_spark.functions.decode import decode_documents
    from dxf_postgis_converter_spark.operators.spatial_join import point_in_polygon_join
    from dxf_postgis_converter_spark.operators.tiles import tile_pyramid_counts
    from dxf_postgis_converter_spark.plans.lineage import (
        LineageLog, run_stage, run_stage_from_table,
    )
    from dxf_postgis_converter_spark.sources.snapshot_store import SnapshotTable

    # text twin of the JSON stage lines (reference report contract —
    # plans/report.py); written to <out>/report.txt even on failure
    from dxf_postgis_converter_spark.plans.report import PipelineReport
    report = PipelineReport("DXF import")

    def _write_report() -> None:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "report.txt"), "w",
                  encoding="utf-8") as f:
            f.write(report.text() + "\n")

    def _fail_hook(exc_type, exc, tb):  # failure ⇒ ERROR line, no footer
        report.error(f"{exc_type.__name__}: {exc}")
        try:
            _write_report()
        except OSError:
            pass
        sys.__excepthook__(exc_type, exc, tb)

    sys.excepthook = _fail_hook

    lineage = LineageLog(os.path.join(args.out, "lineage"))
    docs = load_documents(spark, args.sf)
    zones = load_zones(spark, args.sf)
    report.step("Source tables loaded", sf=args.sf)

    decode_tf = lambda df: decode_documents(df, keep_media_ref=False)  # noqa: E731
    if args.snapshot is not None:  # caller-tagged lineage (legacy shape)
        s1 = run_stage(
            spark, stage="decode", snapshot_id=args.snapshot, source=docs,
            transform=decode_tf, out_dir=os.path.join(args.out, "entities"),
            lineage=lineage, n_buckets=args.n_buckets)
    else:
        # source-of-truth shape: documents live in a versioned table; the
        # decode stage's resume state is keyed by the table's actual
        # snapshot id, so re-running after a new ingest commit
        # re-processes while a plain re-run resumes
        docs_tbl = SnapshotTable(spark, os.path.join(args.out, "documents_tbl"))
        if not docs_tbl.exists():
            docs_tbl.append(docs)
        s1 = run_stage_from_table(
            spark, stage="decode", table=docs_tbl, transform=decode_tf,
            out_dir=os.path.join(args.out, "entities"), lineage=lineage,
            n_buckets=args.n_buckets)
    print(json.dumps(s1))
    report.step("Documents decoded to entities", rows=s1["rows"],
                buckets=s1["processed_buckets"])

    ents = spark.read.parquet(os.path.join(args.out, "entities"))
    pts = ents.filter(F.col("geom_type") == "POINT").select(
        "doc_id", "handle", F.col("xmin").alias("x"), F.col("ymin").alias("y"))
    pip = point_in_polygon_join(pts, zones, res=6) \
        .groupBy("zone_id").agg(F.count("*").alias("n"))
    pip.write.mode("overwrite").parquet(os.path.join(args.out, "zone_counts"))
    n_zones = spark.read.parquet(os.path.join(args.out, "zone_counts")).count()
    print(json.dumps({"stage": "pip", "zones_with_hits": n_zones}))
    report.step("Point-in-polygon join", zones_with_hits=n_zones)

    tiles = tile_pyramid_counts(ents.filter(F.col("xmin").isNotNull()), z_max=8, z_min=4)
    tiles.write.mode("overwrite").parquet(os.path.join(args.out, "tile_counts"))
    n_tiles = spark.read.parquet(os.path.join(args.out, "tile_counts")).count()
    print(json.dumps({"stage": "tiles", "tiles": n_tiles}))
    report.step("Tile pyramid rollup", tiles=n_tiles)

    # FILE-mode export: every document back out as a real .dxf drawing
    # (sources/dxf_export.py — one shuffle-free Python stage)
    from dxf_postgis_converter_spark.sources.dxf_export import documents_to_dxf

    documents_to_dxf(docs).write.mode("overwrite") \
        .parquet(os.path.join(args.out, "dxf_files"))
    ex = spark.read.parquet(os.path.join(args.out, "dxf_files")).agg(
        F.count("*").alias("files"),
        F.sum("n_entities").alias("entities"),
        F.sum("n_skipped").alias("skipped"),
        F.sum(F.length("dxf_content")).alias("bytes")).first()
    print(json.dumps({"stage": "export", "files": ex["files"],
                      "entities": int(ex["entities"] or 0),
                      "skipped": int(ex["skipped"] or 0),
                      "bytes": int(ex["bytes"] or 0)}))
    report.step("Documents exported as .dxf", files=ex["files"],
                skipped=int(ex["skipped"] or 0))

    # benchmark contamination (GPT-3 13-gram rule) over the documents'
    # concatenated text spans: the benchmark side is derived 13-token
    # slices of a doc subset, so flags exist by construction and the
    # stage exercises the broadcast gram join end-to-end
    from dxf_postgis_converter_spark.functions.text import normalize_text
    from dxf_postgis_converter_spark.operators.dedup import (
        benchmark_contamination,
    )

    txt = docs.select("doc_id", F.array_join(F.transform(
        F.filter("spans", lambda s: s["kind"] == "text"),
        lambda s: s["text"]), " ").alias("text"))
    toks = F.split(normalize_text(F.col("text")), " ")
    bench = txt.filter(F.expr("right(doc_id, 1) = '0'")).select(
        F.concat(F.lit("B"), F.col("doc_id")).alias("bench_id"),
        F.array_join(F.slice(toks, 2, 13), " ").alias("text"))
    cont = benchmark_contamination(txt, bench, n=13)
    cont.write.mode("overwrite").parquet(os.path.join(args.out, "contamination"))
    cs = spark.read.parquet(os.path.join(args.out, "contamination")).agg(
        F.count("*").alias("pairs"),
        F.countDistinct("doc_id").alias("docs"),
        F.countDistinct("bench_id").alias("bench_items")).first()
    print(json.dumps({"stage": "contamination", "pairs": int(cs["pairs"]),
                      "flagged_docs": int(cs["docs"]),
                      "bench_items_hit": int(cs["bench_items"])}))
    report.step("Benchmark contamination sweep", pairs=int(cs["pairs"]),
                flagged_docs=int(cs["docs"]))

    print(json.dumps({"status": "ok", "entities": s1["rows"],
                      "zones_with_hits": n_zones, "tiles": n_tiles,
                      "exported_files": ex["files"],
                      "contaminated_pairs": int(cs["pairs"])}))
    _write_report()
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
