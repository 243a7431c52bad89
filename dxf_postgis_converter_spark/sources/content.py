"""Content-blob table (S10) + FILE-mode export: the whole source
document stored verbatim as one binary value per doc_id.

The reference keeps each imported file's bytes in a BYTEA column and can
export them back unchanged (postgis_content_repository.py:74-117 store,
export_use_case.py:80-91,149-178 FILE-mode export;
data_viewer_use_case.py:256-274 reports OCTET_LENGTH over the blob). In
this engine the "file" is the interleaved span sequence
(BASELINE.json input_hint), so the blob is a canonical byte
serialization of the spans — enough to reproduce the document exactly
(export → parse == original spans, tested in tests/test_content.py).

Format (one record per span, in array order):
    kind 0x1F text 0x1F media_ref 0x1F offset 0x1E
UTF-8 encoded; 0x1F/0x1E are the ASCII unit/record separators, which
cannot occur in span fields (corpus text is printable).

Scale shape: building the blob is a narrow per-row map (transform +
array_join + encode — all JVM); the binary column lives in its own table
keyed by doc_id so it never rides through entity-level shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIELD_SEP = "\x1f"
SPAN_SEP = "\x1e"


def document_content(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → (doc_id, content binary)."""
    record = lambda s: F.concat(
        s.kind, F.lit(FIELD_SEP), s.text, F.lit(FIELD_SEP),
        s.media_ref, F.lit(FIELD_SEP), s.offset.cast("string"), F.lit(SPAN_SEP))
    payload = F.array_join(F.transform("spans", record), "")
    return documents.select("doc_id", F.encode(payload, "UTF-8").alias("content"))


def content_sizes(content: DataFrame) -> DataFrame:
    """A9 OCTET_LENGTH on the real blob bytes
    (data_viewer_use_case.py:256-274)."""
    return content.select("doc_id", F.octet_length("content").alias("content_bytes"))


def export_content(content: DataFrame) -> DataFrame:
    """FILE-mode export: the stored bytes back, decoded — verbatim."""
    return content.select("doc_id", F.decode("content", "UTF-8").alias("payload"))


def parse_payload(payload: str) -> list[tuple[str, str, str, int]]:
    """Driver-side parse of one exported payload back to span tuples
    (kind, text, media_ref, offset) — the export round-trip check."""
    out = []
    for rec in payload.split(SPAN_SEP):
        if not rec:
            continue
        kind, text, media_ref, offset = rec.split(FIELD_SEP)
        out.append((kind, text, media_ref, int(offset)))
    return out
