"""Batch/stream parity + streaming dedup over the events shape."""

import pyspark.sql.functions as F
import pytest

from dxf_postgis_converter_spark.streaming.events import (
    dedup_events,
    hourly_event_counts,
    read_event_stream,
    run_available_now,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def batch_events(spark):
    return spark.read.parquet(EVENTS).cache()


def test_batch_stream_parity(spark, batch_events, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck"))
    src = str(tmp_path_factory.mktemp("events_dir"))  # file source needs a dir
    batch_events.write.mode("overwrite").parquet(src)
    stream = read_event_stream(spark, src)
    got = run_available_now(hourly_event_counts(stream), ck, "parity_agg")
    expected = hourly_event_counts(spark.read.parquet(src)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_streaming_dedup_drops_replays(spark, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck"))
    src = str(tmp_path_factory.mktemp("events_dup"))
    base = spark.read.parquet(EVENTS).limit(200)
    base.unionByName(base).write.mode("overwrite").parquet(src)  # every event twice
    stream = dedup_events(read_event_stream(spark, src))
    q = (stream.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").first()
    assert got.n == got.d == 200


def test_incremental_trigger_matches_single_shot(spark, batch_events, tmp_path_factory):
    """maxFilesPerTrigger forces multiple micro-batches; complete-mode
    result must equal the batch aggregation regardless of batching."""
    ck = str(tmp_path_factory.mktemp("ck"))
    src = str(tmp_path_factory.mktemp("events_parts"))
    spark.read.parquet(EVENTS).repartition(8).write.mode("overwrite").parquet(src)
    stream = read_event_stream(spark, src, max_files_per_trigger=2)
    got = run_available_now(hourly_event_counts(stream), ck, "inc_agg")
    expected = hourly_event_counts(spark.read.parquet(src)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_exactly_once_sink(spark, batch_events, tmp_path_factory):
    from dxf_postgis_converter_spark.streaming.events import write_stream_exactly_once
    src = str(tmp_path_factory.mktemp("eo_src"))
    out = str(tmp_path_factory.mktemp("eo_out"))
    ck = str(tmp_path_factory.mktemp("eo_ck"))
    batch_events.limit(500).repartition(4).write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = write_stream_exactly_once(stream, out, ck).trigger(availableNow=True).start()
    q.awaitTermination()
    n1 = spark.read.parquet(out).count()
    assert n1 == 500

    # restart with the same checkpoint: nothing new → no change
    q = write_stream_exactly_once(read_event_stream(spark, src), out, ck) \
        .trigger(availableNow=True).start()
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 500

    # simulate a replayed micro-batch (at-least-once delivery): rewriting
    # batch 0 must replace, not duplicate
    import pyspark.sql.functions as F
    first_batch = spark.read.parquet(out).filter("_batch = 0").drop("_batch")
    (first_batch.withColumn("_batch", F.lit(0))
     .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     .partitionBy("_batch").parquet(out))
    got = spark.read.parquet(out)
    assert got.count() == 500
    assert got.select("event_id").distinct().count() == 500
