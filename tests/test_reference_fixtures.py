"""Parity against the reference repo's OWN fixture drawings — real
AutoCAD-produced files (dxf_examples/ex1-3.dxf), not synthetic corpus
data. These are the inputs the reference's integration suite runs on
(tests/test_integration.py:36-39), so matching their measured content
is direct evidence the pure-Python tag codec ingests what the
reference ingests:

- entity-type histograms equal the measured content recorded in
  SURVEY §5 (ex3's MULTILEADERs include the Cyrillic mtext content and
  real dogleg/leader-line context data);
- the full span pipeline (extraction rules, ByLayer snapshots, INSERT
  block closure) is live on every entity;
- write→parse is a FIXED POINT on real data: re-serializing the parsed
  snapshots through our own writer reproduces every media_ref byte.

Read-only: fixtures are consumed in place from /root/reference (data,
not code); every test skips when that tree is absent.
"""

import collections
import os

import pytest

from dxf_postgis_converter_spark.sources.dxf_files import (
    spans_from_entity_snapshots,
)
from dxf_postgis_converter_spark.sources.dxf_parser import parse_dxf, write_dxf

_EXAMPLES = "/root/reference/dxf_examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_EXAMPLES), reason="reference fixtures not present")

# measured content of the ENTITIES section (SURVEY §5 records the same
# histograms, modulo its explicitly-approximate ex3 note which omits
# the 3 ARCs)
_EXPECT = {
    "ex1": {"LWPOLYLINE": 82, "LINE": 32, "ARC": 27, "CIRCLE": 5, "SPLINE": 4},
    "ex2": {"SPLINE": 45},
    "ex3": {"TEXT": 1445, "POINT": 1294, "LWPOLYLINE": 407, "CIRCLE": 207,
            "INSERT": 181, "LINE": 28, "MULTILEADER": 18, "ARC": 3,
            "3DSOLID": 1},
}


def _load(ex):
    with open(os.path.join(_EXAMPLES, f"{ex}.dxf"),
              encoding="utf-8", errors="replace") as f:
        return parse_dxf(f.read())


@pytest.mark.parametrize("ex", sorted(_EXPECT))
def test_fixture_entity_histogram(ex):
    _styles, snaps, _blocks = _load(ex)
    got = collections.Counter(s[0] for s in snaps)
    assert dict(got) == _EXPECT[ex]


@pytest.mark.parametrize("ex", sorted(_EXPECT))
def test_fixture_spans_live_and_writer_fixed_point(ex):
    styles, snaps, blocks = _load(ex)
    spans1 = spans_from_entity_snapshots(snaps, styles, blocks)
    assert len(spans1) == sum(_EXPECT[ex].values())
    assert all(s["media_ref"] for s in spans1)
    styles2, snaps2, blocks2 = parse_dxf(write_dxf(snaps, styles, blocks))
    spans2 = spans_from_entity_snapshots(snaps2, styles2, blocks2)
    assert [s["media_ref"] for s in spans2] == [s["media_ref"] for s in spans1]


def test_ex3_multileader_context_from_real_file():
    """The 18 real MULTILEADERs carry their Cyrillic mtext content (code
    304 'Default text content'), leader-line vertices, and dogleg
    properties — the context data the reference's visual-signature test
    asserts on (test_integration.py:802-913)."""
    _styles, snaps, _blocks = _load("ex3")
    mls = [s[2] for s in snaps if s[0] == "MULTILEADER"]
    assert len(mls) == 18
    texts = [g.get("text", "") for g in mls]
    assert sum(bool(t) for t in texts) == 18
    assert any(t.startswith("т.") for t in texts)  # Cyrillic labels
    with_lines = [g for g in mls
                  if any(len(line) > 0 for line in g.get("leader_lines", []))]
    assert len(with_lines) >= 15
    props = [p for g in mls for p in g.get("leader_properties", [])]
    assert any("dogleg_vector" in p and "dogleg_length" in p for p in props)


def test_fixtures_through_full_spark_ingest_and_decode(spark):
    """End-to-end S1 on real files: binaryFile scan → tag-codec span
    extraction → Arrow-batched decode. Every one of the 3779 real
    entities decodes with NO error rows, and the geometry-kind split is
    sane (points/lines/polygons all present)."""
    from pyspark.sql import functions as F

    from dxf_postgis_converter_spark.functions.decode import decode_documents
    from dxf_postgis_converter_spark.sources.dxf_files import (
        dxf_files_to_documents, scan_dxf_files,
    )

    files = scan_dxf_files(spark, _EXAMPLES)
    docs = dxf_files_to_documents(files)
    assert docs.count() == 3
    ents = decode_documents(docs).cache()
    try:
        assert ents.count() == sum(sum(v.values()) for v in _EXPECT.values())
        assert ents.filter("error is not null").count() == 0
        kinds = {r["geom_type"] for r in
                 ents.select("geom_type").distinct().collect()}
        assert {"POINT", "LINESTRING", "POLYGON"} <= kinds
        by_type = {r["entity_type"]: r["n"] for r in
                   ents.groupBy("entity_type").agg(
                       F.count("*").alias("n")).collect()}
        assert by_type["MULTILEADER"] == 18 and by_type["TEXT"] == 1445
    finally:
        ents.unpersist()


def test_ex3_layer_table_and_blocks():
    """Russian-named layer styles and the BLOCKS section survive: the
    INSERTs' block closure resolves against real block definitions."""
    import json

    styles, snaps, blocks = _load("ex3")
    assert len(blocks) >= 20
    assert len({s[4] for s in snaps}) >= 25  # entity layers in use
    spans = spans_from_entity_snapshots(snaps, styles, blocks)
    inserts = [json.loads(s["media_ref"]) for s in spans
               if json.loads(s["media_ref"])["entity_type"] == "INSERT"]
    assert len(inserts) == 181
    resolved = [p for p in inserts
                if p["extra_data"].get("block_entities")]
    assert len(resolved) > 100  # most INSERTs reference a defined block


def test_ex3_insert_expansion_virtual_entities(spark):
    """r7: INSERT virtual-entity expansion on the real AutoCAD file —
    ex3's 181 INSERTs explode into their blocks' transformed contents
    (ezdxf-Frontend behavior, dxf_reader.py:724-750) with zero error
    rows, and every virtual geometry lands inside the expected drawing
    extent window of its source insert points."""
    from pyspark.sql import functions as F

    from dxf_postgis_converter_spark.functions.decode import decode_documents
    from dxf_postgis_converter_spark.operators.insert_expand import (
        expand_inserts,
    )
    from dxf_postgis_converter_spark.sources.dxf_files import (
        dxf_files_to_documents, scan_dxf_files,
    )

    docs = dxf_files_to_documents(
        scan_dxf_files(spark, _EXAMPLES)).filter("doc_id like '%ex3%'")
    ents = decode_documents(docs).cache()
    try:
        virt = expand_inserts(ents).cache()
        try:
            n = virt.count()
            assert n > 100  # >100 resolved closures, each ≥1 entity
            assert virt.filter("error is not null").count() == 0
            # world placement: virtual bboxes sit within the (padded)
            # envelope of the drawing's own insert points
            env = ents.filter("entity_type = 'INSERT'").agg(
                F.min("xmin"), F.max("xmax"),
                F.min("ymin"), F.max("ymax")).first()
            pad = 0.10 * max(env[1] - env[0], env[3] - env[2])
            bad = virt.filter(
                (F.col("xmin") < env[0] - pad) | (F.col("xmax") > env[1] + pad)
                | (F.col("ymin") < env[2] - pad)
                | (F.col("ymax") > env[3] + pad)).count()
            assert bad == 0
        finally:
            virt.unpersist()
    finally:
        ents.unpersist()
