"""Round-trip reconstruction sink (S12) + span-sequence invariant.

The reference rebuilds a DXF document from DB rows
(dxf_writer.py:53-192 reconstruct_from_entities) and its integration
tests assert per-layer entity-fingerprint multiset equality — Counter
over (dxftype, sorted geometry keys, geometry item count)
(tests/test_integration.py:438-461). In this engine the document format
is the interleaved spans table (BASELINE.json input_hint), so
reconstruction = rebuilding each document's span array from the decoded
entities + text spans, and the gate is **span-sequence equality
(kind, text, media_ref, order)** per document.

Spark shape (one narrow Python stage, everything else JVM):

  entities --mapInPandas--> (doc_id, span_offset, media_ref')   [Arrow]
  text spans ---------------------------------------- select     [JVM]
  union → groupBy(doc_id) → array_sort(collect_list(struct))     [JVM]
  → documents'(doc_id, spans)

The rebuild is exact because decode stores the payload verbatim in
data_json (geometries/attributes untouched; postgis_entity_repository.py
:238-243 JSONB shape) and the corpus's extra_data contract pins which
keys were source keys vs converter-derived updates
(postgis_entity_converter.py:137-142 merges converter output into
extra_data; we strip it back off).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus import SPANS_SCHEMA, canonical_media_ref

# source-payload extra_data keys (corpus contract; everything else in the
# stored extra_data was merged in by a converter and is not part of the
# original payload)
RT_EXTRA_KEYS = ("dxftype", "layer_name", "block_name", "block_entities")

_REF_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_offset", T.IntegerType()),
    T.StructField("media_ref", T.StringType()),
])


def _rebuild_batches(batches):
    for pdf in batches:
        refs = []
        for dj in pdf["data_json"].tolist():
            d = json.loads(dj)
            extra = d.get("extra_data", {}) or {}
            src_extra = {k: extra[k] for k in RT_EXTRA_KEYS if k in extra}
            refs.append(canonical_media_ref(
                d.get("entity_type", ""), d.get("name", ""), d.get("handle", ""),
                d.get("layer", ""), d.get("attributes", {}) or {},
                d.get("geometries", {}) or {}, src_extra))
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"], "span_offset": pdf["span_offset"], "media_ref": refs})


def rebuild_media_refs(entities: DataFrame) -> DataFrame:
    """entities → (doc_id, span_offset, media_ref) with the media_ref
    payload re-serialized canonically from the stored data_json."""
    return entities.select("doc_id", "span_offset", "data_json") \
        .mapInPandas(_rebuild_batches, schema=_REF_SCHEMA)


def reconstruct_documents(entities: DataFrame, texts: DataFrame) -> DataFrame:
    """(entities, text spans) → documents(doc_id, spans) with spans in
    original offset order. texts: (doc_id, span_offset, text)."""
    media = rebuild_media_refs(entities).select(
        "doc_id", F.lit("media").alias("kind"), F.lit("").alias("text"),
        "media_ref", F.col("span_offset").alias("offset"))
    text = texts.select(
        "doc_id", F.lit("text").alias("kind"), F.col("text"),
        F.lit("").alias("media_ref"), F.col("span_offset").alias("offset"))
    allspans = media.unionByName(text)
    # offset-first struct → array_sort orders by offset; then re-shape to
    # the canonical (kind, text, media_ref, offset) field order — all JVM
    sorted_spans = F.array_sort(
        F.collect_list(F.struct("offset", "kind", "text", "media_ref")))
    return (
        allspans.groupBy("doc_id")
        .agg(F.transform(
            sorted_spans,
            lambda s: F.struct(
                s.kind.alias("kind"), s.text.alias("text"),
                s.media_ref.alias("media_ref"), s.offset.alias("offset")),
        ).alias("spans"))
        .select(F.col("doc_id").cast("string"),
                F.col("spans").cast(SPANS_SCHEMA["spans"].dataType))
    )


def span_mismatches(original: DataFrame, rebuilt: DataFrame) -> DataFrame:
    """doc_ids whose span sequence differs (missing doc counts as
    mismatch). Full outer join + array equality — one shuffle on doc_id."""
    a = original.select("doc_id", F.col("spans").alias("spans_a"))
    b = rebuilt.select("doc_id", F.col("spans").alias("spans_b"))
    return (
        a.join(b, "doc_id", "full_outer")
        .filter(~F.coalesce(F.col("spans_a") == F.col("spans_b"), F.lit(False)))
        .select("doc_id")
    )


def reconstruction_report(entities: DataFrame) -> DataFrame:
    """Per-type reconstructed counts (dxf_writer.py:130-137 report)."""
    return entities.groupBy("entity_type").agg(
        F.count("*").alias("n"),
        F.count("geometry_wkb").alias("n_with_geometry"))


def layer_fingerprints(entities: DataFrame) -> DataFrame:
    """Per-layer fingerprint multiset — the reference correctness oracle
    (tests/test_integration.py:438-461): Counter over
    (dxftype, sorted geometry keys, geometry key count). JSON key
    extraction is built-in (json_object_keys) so this never leaves the JVM."""
    gkeys = F.json_object_keys(F.get_json_object(F.col("data_json"), "$.geometries"))
    fp = F.concat_ws(
        "|",
        F.col("entity_type"),
        F.array_join(F.array_sort(gkeys), ","),
        F.coalesce(F.size(gkeys), F.lit(0)).cast("string"))
    return entities.groupBy("layer", fp.alias("fingerprint")) \
        .agg(F.count("*").alias("n"))


def save_selected_by_handles(documents: DataFrame, handles: DataFrame) -> DataFrame:
    """Filtered copy (S11, dxf_writer.py:24-51): documents with media
    spans not in the handle set removed; text spans and original offsets
    preserved (the reference deletes unselected entities in place).

    Handle normalization is upper+strip, copying dxf_writer.py:34. The
    whole op is JVM column algebra — handle extraction via
    get_json_object, broadcast semi-join, array re-assembly."""
    h = F.broadcast(
        handles.select(F.upper(F.trim(F.col("handle"))).alias("_h")).distinct())
    spans = documents.select("doc_id", F.explode("spans").alias("s"))
    media = spans.filter(F.col("s.kind") == "media").withColumn(
        "_h", F.upper(F.trim(F.get_json_object(F.col("s.media_ref"), "$.handle"))))
    kept = media.join(h, "_h", "left_semi").select("doc_id", "s") \
        .unionByName(spans.filter(F.col("s.kind") != "media").select("doc_id", "s"))
    sorted_spans = F.array_sort(F.collect_list(
        F.struct(F.col("s.offset").alias("offset"), F.col("s.kind").alias("kind"),
                 F.col("s.text").alias("text"), F.col("s.media_ref").alias("media_ref"))))
    return (
        kept.groupBy("doc_id")
        .agg(F.transform(
            sorted_spans,
            lambda s: F.struct(
                s.kind.alias("kind"), s.text.alias("text"),
                s.media_ref.alias("media_ref"), s.offset.alias("offset")),
        ).alias("spans"))
    )
