"""The batch spatial operators compose unchanged onto a document stream:
availableNow drain == batch pipeline, micro-batching included."""

import pyspark.sql.functions as F
import pytest

from dxf_postgis_converter_spark.functions.decode import decode_documents
from dxf_postgis_converter_spark.operators.spatial_join import point_in_polygon_join
from dxf_postgis_converter_spark.streaming.pipeline import (
    read_document_stream,
    streaming_zone_hits,
)


def test_stream_pip_matches_batch(spark, docs_df, zones_df, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("docs_stream"))
    ck = str(tmp_path_factory.mktemp("ck"))
    docs_df.repartition(6).write.mode("overwrite").parquet(src)

    stream = streaming_zone_hits(
        read_document_stream(spark, src, max_files_per_trigger=2), zones_df)
    q = (stream.writeStream.format("memory").queryName("pip_stream")
         .outputMode("append").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT doc_id, handle, zone_id FROM pip_stream").collect()

    batch_docs = spark.read.parquet(src)
    ents = decode_documents(batch_docs, keep_media_ref=False)
    pts = ents.filter(F.col("geom_type") == "POINT").select(
        "doc_id", "handle", F.col("xmin").alias("x"), F.col("ymin").alias("y"))
    want = point_in_polygon_join(pts, zones_df, res=6) \
        .select("doc_id", "handle", "zone_id").collect()

    key = lambda r: (r.doc_id, r.handle, r.zone_id)
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(want) > 0
