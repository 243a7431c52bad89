"""FILE-mode DXF export (sources/dxf_export.py ≙
dxf_writer.reconstruct_from_entities, dxf_writer.py:53-192).

Contract under test: export → re-ingest is media_ref-byte-exact for
every supported type except SPLINE (whose stored geometry is already
the read-time-flattened polyline; the reference writer restores no
spline geometry at all), layer styles and the recursive block closure
survive, and corpus-generated payloads (no dxf_attribs record, synthetic
extra_data) round-trip at geometry value level."""

import json

from dxf_postgis_converter_spark.corpus import build_document
from dxf_postgis_converter_spark.sources.dxf_export import (
    document_to_dxf,
    documents_to_dxf,
    payload_to_snapshot,
)
from dxf_postgis_converter_spark.sources.dxf_files import (
    spans_from_entity_snapshots,
)
from dxf_postgis_converter_spark.sources.dxf_parser import parse_dxf
from tests.test_dxf_parser import ALL_TYPES, BLOCK_DEFS, STYLES


def _reingest(content: bytes):
    styles, snaps, blocks = parse_dxf(content.decode("utf-8"))
    return spans_from_entity_snapshots(snaps, styles, blocks), styles, blocks


def test_export_reingest_byte_exact_except_spline():
    spans1 = spans_from_entity_snapshots(ALL_TYPES, STYLES, BLOCK_DEFS)
    content, n, skipped = document_to_dxf(spans1)
    assert (n, skipped) == (len(ALL_TYPES), 0)
    spans2, styles, blocks = _reingest(content)
    assert styles == STYLES  # layer table restored from ByLayer snapshots
    assert set(blocks) == set(BLOCK_DEFS)  # recursive closure re-rooted
    assert len(spans2) == len(spans1)
    for s1, s2 in zip(spans1, spans2):
        p1 = json.loads(s1["media_ref"])
        if p1["entity_type"] == "SPLINE":
            g2 = json.loads(s2["media_ref"])["geometries"]
            # shape-preserving: same keys, clamped endpoints exact
            assert sorted(g2) == sorted(p1["geometries"])
            assert g2["points"][0] == p1["geometries"]["points"][0]
            assert g2["points"][-1] == p1["geometries"]["points"][-1]
        else:
            assert s1["media_ref"] == s2["media_ref"], p1["entity_type"]


def _subsumed(a, b, path=""):
    """Every value in a appears identically in b; b may carry EXTRA keys
    (re-extraction fills type defaults the synthetic corpus payloads
    omit, e.g. TEXT halign/style)."""
    if isinstance(a, dict):
        assert isinstance(b, dict), path
        for k, v in a.items():
            _subsumed(v, b.get(k), f"{path}.{k}")
    elif isinstance(a, list):
        assert isinstance(b, list) and len(b) == len(a), path
        for i, (x, y) in enumerate(zip(a, b)):
            _subsumed(x, y, f"{path}[{i}]")
    else:
        assert a == b, f"{path}: {a!r} != {b!r}"


def test_corpus_payloads_roundtrip_value_level():
    """Corpus payloads have NO dxf_attribs record and synthetic
    extra_data, so the oracle is geometry VALUE subsumption for
    extractor-backed types (re-extraction may add type-default keys).
    Fully lossy types: SPLINE (flattening), WIPEOUT (no extraction rule
    — the reference writer has no geometry branch for it either).
    MULTILEADER is exact since round 6 (codec CONTEXT_DATA groups,
    reference builder parity dxf_writer.py:508-664). HATCH is exact at
    the reference's 6-dp signature since round 7 (pattern, solid flag,
    typed paths incl. edge line/arc params — test_integration.py:592-623
    contract; the raw 3-D ``boundaries`` mirror is outside it)."""
    from dxf_postgis_converter_spark.sources.dxf_export import (
        _hatch_signature,
    )
    lossy = {"SPLINE", "WIPEOUT"}
    checked = {}
    for idx in range(12):
        _did, spans = build_document(idx)
        media = [s for s in spans if s["kind"] == "media"]
        content, n, skipped = document_to_dxf(spans)
        assert (n, skipped) == (len(media), 0)
        spans2, _styles, _blocks = _reingest(content)
        assert len(spans2) == len(media)
        for s1, s2 in zip(media, spans2):
            p1, p2 = json.loads(s1["media_ref"]), json.loads(s2["media_ref"])
            et = p1["entity_type"]
            assert p2["entity_type"] == et
            assert p2["layer"] == p1["layer"]
            assert p2["handle"] == p1["handle"]
            if et == "HATCH":
                g1, g2 = p1["geometries"], p2["geometries"]
                assert _hatch_signature(g2) == _hatch_signature(g1)
                checked[et] = checked.get(et, 0) + 1
                continue
            if et in lossy:
                continue
            _subsumed(p1["geometries"], p2["geometries"], et)
            checked[et] = checked.get(et, 0) + 1
    # the corpus draw actually exercised a broad slice of the types
    assert len(checked) >= 15, sorted(checked)


def test_unresolvable_payload_skipped_and_counted():
    spans = [{"kind": "media", "text": "",
              "media_ref": json.dumps({"attributes": {}, "entity_type": "",
                                       "extra_data": {}, "geometries": {},
                                       "handle": "x", "layer": "0",
                                       "name": "?"}),
              "offset": 0}]
    content, n, skipped = document_to_dxf(spans)
    assert (n, skipped) == (0, 1)
    assert payload_to_snapshot({"extra_data": {}}) is None


def test_documents_to_dxf_spark_stage(spark):
    """Distributed export: documents → one drawing per doc in a single
    Python stage; re-ingesting an exported doc reproduces its media
    span count."""
    rows = [build_document(i) for i in range(6)]
    docs = spark.createDataFrame(
        [(d, [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in sp]) for d, sp in rows],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    out = {r.doc_id: r for r in documents_to_dxf(docs).collect()}
    assert len(out) == 6
    for did, sp in rows:
        media = [s for s in sp if s["kind"] == "media"]
        r = out[did]
        assert (r.n_entities, r.n_skipped) == (len(media), 0)
        spans2, _s, _b = _reingest(bytes(r.dxf_content))
        assert len(spans2) == len(media)


def test_export_roundtrip_report_stage(spark):
    """The distributed fidelity report: every corpus-built document comes
    back fully exported, fully re-ingested, zero mismatches."""
    from dxf_postgis_converter_spark.sources.dxf_export import (
        export_roundtrip_report,
    )
    rows = [build_document(i) for i in range(4)]
    docs = spark.createDataFrame(
        [(d, [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in sp]) for d, sp in rows],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    rep = {r.doc_id: r for r in export_roundtrip_report(docs).collect()}
    assert len(rep) == 4
    for did, sp in rows:
        n = sum(1 for s in sp if s["kind"] == "media")
        r = rep[did]
        assert (r.n_media, r.n_exported, r.n_skipped,
                r.n_reingested, r.n_mismatch) == (n, n, 0, n, 0)


def test_roundtrip_mismatch_counter_detects_drift():
    """Mutation check: the report's compare is not vacuously zero — a
    tampered layer, a tampered geometry value, and a length drift are
    each counted."""
    from dxf_postgis_converter_spark.sources.dxf_export import (
        _LOSSY_GEOM, _roundtrip_mismatches,
    )
    _did, spans = build_document(0)
    media = [s["media_ref"] for s in spans if s["kind"] == "media"]
    content, _, _ = document_to_dxf(spans)
    spans2, _s, _b = _reingest(content)
    assert _roundtrip_mismatches(media, spans2) == 0

    tampered = list(media)
    p = json.loads(tampered[0])
    p["layer"] = "___nope___"
    tampered[0] = json.dumps(p)
    assert _roundtrip_mismatches(tampered, spans2) == 1

    # geometry-value tamper on a non-lossy entity (not HATCH — its
    # compare is the signature, exercised by the dedicated tests below)
    idx = next(i for i, ref in enumerate(media)
               if json.loads(ref)["entity_type"] not in _LOSSY_GEOM
               and json.loads(ref)["entity_type"] != "HATCH"
               and json.loads(ref)["geometries"])
    tampered = list(media)
    p = json.loads(tampered[idx])
    k = sorted(p["geometries"])[0]
    p["geometries"][k] = "__drift__"
    tampered[idx] = json.dumps(p)
    assert _roundtrip_mismatches(tampered, spans2) == 1

    assert _roundtrip_mismatches(media[:-1], spans2) == 1  # length drift


def _hatch_payload(hatch_paths):
    return {"attributes": {"layer": "0"}, "entity_type": "HATCH",
            "extra_data": {"dxftype": "HATCH"},
            "geometries": {"boundaries": [],
                           "hatch_paths": hatch_paths,
                           "pattern_name": "ANSI31", "solid_fill": False},
            "handle": "H1", "layer": "0", "name": "h"}


def _hatch_span(hatch_paths):
    return {"kind": "media", "text": "",
            "media_ref": json.dumps(_hatch_payload(hatch_paths)),
            "offset": 0}


def test_hatch_edge_paths_roundtrip_signature_exact():
    """Round 7 (VERDICT r6 item 3): HATCH edge paths — line AND arc
    params — survive FILE-mode export→re-ingest at the reference's 6-dp
    signature (test_integration.py:592-623; writer contract
    dxf_writer.py:476-497). The corpus only draws line edges, so this
    pins the arc branch explicitly."""
    from dxf_postgis_converter_spark.sources.dxf_export import (
        _hatch_signature, _roundtrip_mismatches,
    )
    paths = [
        {"path_type": "polyline", "is_closed": False,
         "vertices": [[0.125, 0.25], [3.0, 0.0], [3.0, 4.0]]},
        {"path_type": "edge", "edges": [
            {"edge_type": "line", "start": [0.0, 0.0, 0.0],
             "end": [1.5, 0.0, 0.0]},
            {"edge_type": "arc", "center": [1.5, 0.75, 0.0],
             "radius": 0.75, "start_angle": 270.0, "end_angle": 90.0,
             "ccw": False},
            {"edge_type": "line", "start": [1.5, 1.5], "end": [0.0, 0.0]},
        ]},
    ]
    span = _hatch_span(paths)
    content, n, skipped = document_to_dxf([span])
    assert (n, skipped) == (1, 0)
    spans2, _s, _b = _reingest(content)
    assert len(spans2) == 1
    g1 = _hatch_payload(paths)["geometries"]
    g2 = json.loads(spans2[0]["media_ref"])["geometries"]
    sig = _hatch_signature(g2)
    assert sig == _hatch_signature(g1)
    # the arc's params actually reached the signature (not vacuous)
    assert sig[2][1] == ("edge", (
        ("line", (0.0, 0.0), (1.5, 0.0)),
        ("arc", (1.5, 0.75), 0.75, 270.0, 90.0, False),
        ("line", (1.5, 1.5), (0.0, 0.0)),
    ))
    assert _roundtrip_mismatches([span["media_ref"]], spans2) == 0


def test_hatch_signature_detects_edge_param_drift():
    """Mutation check for the r7 fidelity upgrade: a tampered arc
    radius, a tampered polyline vertex, and a flipped ccw are each a
    counted mismatch (previously HATCH relaxed to path-count and would
    have passed all three silently)."""
    from dxf_postgis_converter_spark.sources.dxf_export import (
        _roundtrip_mismatches,
    )
    paths = [
        {"path_type": "polyline", "is_closed": True,
         "vertices": [[0.0, 0.0], [2.0, 0.0], [2.0, 2.0]]},
        {"path_type": "edge", "edges": [
            {"edge_type": "arc", "center": [1.0, 1.0], "radius": 2.5,
             "start_angle": 10.0, "end_angle": 350.0, "ccw": True}]},
    ]
    span = _hatch_span(paths)
    content, _, _ = document_to_dxf([span])
    spans2, _s, _b = _reingest(content)
    assert _roundtrip_mismatches([span["media_ref"]], spans2) == 0

    def tampered(mutate):
        import copy
        p2 = copy.deepcopy(paths)
        mutate(p2)
        return [_hatch_span(p2)["media_ref"]]

    for mutate in (
        lambda p: p[1]["edges"][0].__setitem__("radius", 2.5000015),
        lambda p: p[0]["vertices"][1].__setitem__(0, 2.000002),
        lambda p: p[1]["edges"][0].__setitem__("ccw", False),
        lambda p: p[0].__setitem__("is_closed", False),
    ):
        assert _roundtrip_mismatches(tampered(mutate), spans2) == 1
