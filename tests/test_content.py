"""Content-blob table (S10) + FILE-mode export round trip."""

from pyspark.sql import functions as F

from dxf_postgis_converter_spark.corpus import load_documents
from dxf_postgis_converter_spark.sources.content import (
    content_sizes, document_content, export_content, parse_payload,
)


def test_content_roundtrip_verbatim(spark):
    docs = load_documents(spark, 0.001).limit(50).cache()
    blob = document_content(docs)
    exported = export_content(blob)
    orig = {r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
            for r in docs.collect()}
    for r in exported.collect():
        assert parse_payload(r.payload) == orig[r.doc_id]


def test_content_is_binary_and_sized(spark):
    docs = load_documents(spark, 0.001).limit(20)
    blob = document_content(docs)
    assert dict(blob.dtypes)["content"] == "binary"
    sizes = {r.doc_id: r.content_bytes for r in content_sizes(blob).collect()}
    for r in blob.collect():
        assert sizes[r.doc_id] == len(bytes(r.content)) > 0


def test_content_utf8_bytes_not_chars(spark):
    # Cyrillic layer names must count as UTF-8 bytes (BYTEA semantics)
    df = spark.createDataFrame(
        [("d1", [("text", "Стены", "", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    n = content_sizes(document_content(df)).first().content_bytes
    # kind(4) + text(10: 5 Cyrillic chars x 2 bytes) + ref(0) + offset(1) + seps(4)
    assert n == 4 + 10 + 0 + 1 + 4
