"""S13 SVG preview sink: well-formed XML, one preview per doc, element
count equals geometry count (+extra paths for multipolygon parts)."""

import xml.etree.ElementTree as ET

import pyspark.sql.functions as F

from dxf_postgis_converter_spark.operators.svg import svg_previews


def test_svg_per_document(entities_df):
    out = svg_previews(entities_df).cache()
    n_docs = entities_df.select("doc_id").distinct().count()
    assert out.count() == n_docs
    rows = out.collect()
    for r in rows[:10]:
        root = ET.fromstring(r.svg)  # well-formed
        assert root.tag.endswith("svg") and "viewBox" in root.attrib
        assert len(list(root)) == r.n_elements
    # every doc with ≥1 geometry renders ≥1 element
    with_geom = entities_df.filter(F.col("geometry_wkb").isNotNull()) \
        .select("doc_id").distinct()
    rendered = out.filter(F.col("n_elements") > 0).select("doc_id")
    assert with_geom.exceptAll(rendered).count() == 0
    # style-aware render: marks carry stroke + the exact effective ACI
    assert all('data-aci="' in r.svg for r in rows if r.n_elements)


def test_svg_effective_color_rules(spark):
    """Reference resolution semantics (operators/styles.py twin):
    true_color wins, ByLayer(256) resolves through the stored layer
    snapshot, ByBlock(0)/absent fall back to 7; ACI anchors exact."""
    import json

    from dxf_postgis_converter_spark.operators.svg import (
        aci_hex, effective_color,
    )
    assert aci_hex(1) == "FF0000" and aci_hex(5) == "0000FF"
    assert aci_hex(254) == "BEBEBE"
    assert effective_color({"true_color": 0x123456}, {}) == (-1, "123456")
    assert effective_color({"color": 3}, {}) == (3, "00FF00")
    assert effective_color({"color": 256},
                           {"layer_dxf_attribs": {"color": 5}}) == (5, "0000FF")
    assert effective_color({"color": 0}, {}) == (7, "FFFFFF")
    assert effective_color({}, {}) == (7, "FFFFFF")

    from dxf_postgis_converter_spark.geometry.wkb import wkb_point as _wp
    wkb_point = _wp(1.0, 0.0, 0.0)
    dj = json.dumps({"attributes": {"color": 256},
                     "extra_data": {"layer_dxf_attribs": {"color": 1}}})
    df = spark.createDataFrame(
        [("d1", bytearray(wkb_point), dj)],
        "doc_id string, geometry_wkb binary, data_json string")
    svg = svg_previews(df).collect()[0].svg
    assert 'stroke="#FF0000"' in svg and 'data-aci="1"' in svg


def test_svg_effective_linetype_dasharray(spark):
    """r7 (VERDICT r6 item 6): dash styling resolves through the SAME
    ByLayer snapshot as color — entity linetype wins, BYLAYER falls back
    to layer_dxf_attribs.linetype, unknown/CONTINUOUS render solid;
    patterns scale with ltscale and land as stroke-dasharray on marks."""
    import json

    from dxf_postgis_converter_spark.operators.svg import effective_linetype

    assert effective_linetype({"linetype": "DASHED"}, {}) \
        == ("DASHED", "0.5 0.25")
    assert effective_linetype({"linetype": "DASHED", "ltscale": 2.0}, {}) \
        == ("DASHED", "1 0.5")
    assert effective_linetype({"linetype": "BYLAYER"},
                              {"layer_dxf_attribs": {"linetype": "CENTER"}}) \
        == ("CENTER", "1.25 0.25 0.25 0.25")
    assert effective_linetype({}, {}) == ("CONTINUOUS", "")
    assert effective_linetype({"linetype": "WEIRD_CUSTOM"}, {}) \
        == ("WEIRD_CUSTOM", "")

    from dxf_postgis_converter_spark.geometry.wkb import wkb_point as _wp
    dashed = json.dumps({"attributes": {"color": 3, "linetype": "DASHED"},
                         "extra_data": {}})
    solid = json.dumps({"attributes": {"color": 3, "linetype": "BYLAYER"},
                        "extra_data": {}})
    df = spark.createDataFrame(
        [("d1", bytearray(_wp(1.0, 0.0, 0.0)), dashed),
         ("d2", bytearray(_wp(2.0, 0.0, 0.0)), solid)],
        "doc_id string, geometry_wkb binary, data_json string")
    out = {r.doc_id: r.svg for r in svg_previews(df).collect()}
    assert 'stroke-dasharray="0.5 0.25"' in out["d1"]
    assert 'data-linetype="DASHED"' in out["d1"]
    assert "stroke-dasharray" not in out["d2"]  # BYLAYER w/o snapshot → solid


def test_svg_text_marks(spark):
    """r7: TEXT/MTEXT/ATTRIB render as <text> marks at the insert point —
    escaped content, font-size from DXF height (0/garbage → 1), rotation
    as an SVG rotate transform, effective-color fill, and never a
    stroke-dasharray (text is filled, not stroked)."""
    import json

    from dxf_postgis_converter_spark.geometry.wkb import wkb_point as _wp

    def dj(etype, geoms, attrs=None):
        return json.dumps({"entity_type": etype, "attributes": attrs or {},
                           "extra_data": {}, "geometries": geoms})

    rows = [
        ("esc", dj("TEXT", {"text": 'a<b & "c">d', "height": 2.5,
                            "rotation": 0.0}, {"color": 1})),
        ("rot", dj("MTEXT", {"text": "spin", "height": 4.0,
                             "rotation": 90.0})),
        ("degen", dj("ATTRIB", {"text": "", "height": "bogus",
                                "rotation": None},
                     {"linetype": "DASHED"})),
        ("plainpt", dj("POINT", {})),
    ]
    df = spark.createDataFrame(
        [(d, bytearray(_wp(1.0, 2.0, 0.0)), j) for d, j in rows],
        "doc_id string, geometry_wkb binary, data_json string")
    out = {r.doc_id: r.svg for r in svg_previews(df).collect()}

    # content XML-escaped, well-formed, height → font-size, color → fill
    assert "a&lt;b &amp; \"c\"&gt;d" in out["esc"]
    ET.fromstring(out["esc"])
    assert 'font-size="2.5"' in out["esc"] and 'fill="#FF0000"' in out["esc"]
    assert 'data-aci="1"' in out["esc"]
    assert "transform" not in out["esc"]  # rotation 0 → no transform

    # DXF CCW rotation → SVG rotate with flipped sign about the anchor
    assert 'transform="rotate(-90 1.000 2.000)"' in out["rot"]

    # degenerate height/rotation fall back, dash never lands on text
    assert 'font-size="1"' in out["degen"]
    assert "stroke-dasharray" not in out["degen"]
    ET.fromstring(out["degen"])

    # non-text point kinds keep the circle mark
    assert "<circle" in out["plainpt"] and "<text" not in out["plainpt"]


def test_svg_fill_semantics(spark):
    """r7: HATCH/SOLID/TRACE render FILLED (one evenodd mark per entity,
    every boundary a subpath → islands knock holes), everything else
    polygonal renders as a fill="none" outline carrying ALL rings —
    mirroring what the ezdxf Frontend draws (reference
    dxf_reader.py:724-750 delegates to Frontend/SVGBackend)."""
    import json

    from dxf_postgis_converter_spark.geometry.wkb import (
        wkb_multipolygon, wkb_polygon,
    )

    sq = [(0, 0, 0), (10, 0, 0), (10, 10, 0), (0, 10, 0)]
    inner = [(4, 4, 0), (6, 4, 0), (6, 6, 0), (4, 6, 0)]

    def dj(etype, extra=None, attrs=None):
        return json.dumps({"entity_type": etype, "attributes": attrs or {},
                           "extra_data": extra or {}, "geometries": {}})

    rows = [
        # multi-boundary HATCH: outer square + island
        ("hatch", wkb_multipolygon([sq, inner]),
         dj("HATCH", {"pattern_name": "ANSI31"}, {"color": 1})),
        # filled quad with a dashed linetype: dash must NOT land on fills
        ("solid", wkb_polygon(sq), dj("SOLID", None,
                                      {"color": 3, "linetype": "DASHED"})),
        # tessellated outline keeps stroke styling, never black-fills
        ("circle", wkb_polygon(sq), dj("CIRCLE", None, {"color": 5})),
        # polygon WITH interior ring on an outline entity: both rings drawn
        ("donut", wkb_polygon(sq, holes=[inner]), dj("3DFACE")),
    ]
    df = spark.createDataFrame(
        [(d, bytearray(w), j) for d, w, j in rows],
        "doc_id string, geometry_wkb binary, data_json string")
    out = {r.doc_id: (r.svg, r.n_elements) for r in svg_previews(df).collect()}

    hatch, n = out["hatch"]
    assert n == 1 and hatch.count("<path") == 1  # ONE mark per HATCH
    assert 'fill="#FF0000"' in hatch and 'fill-rule="evenodd"' in hatch
    assert 'stroke="none"' in hatch and 'data-aci="1"' in hatch
    assert 'data-pattern="ANSI31"' in hatch
    assert hatch.count("M ") == 2  # island is a subpath of the same mark

    solid, _ = out["solid"]
    assert 'fill="#00FF00"' in solid and "stroke-dasharray" not in solid

    circle, _ = out["circle"]
    assert 'fill="none"' in circle and 'stroke="#0000FF"' in circle

    donut, n = out["donut"]
    assert n == 1 and donut.count("M ") == 2  # interior ring not dropped
    assert 'fill="none"' in donut
    for d, _ in out.values():
        ET.fromstring(d)


def test_text_mark_content_roundtrip_property():
    """Any XML-legal content survives mark → parse → .text unchanged
    (pure-function property, no Spark)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dxf_postgis_converter_spark.operators.svg import _text_mark

    # XML 1.0 forbids most C0 controls; the corpus text never carries
    # them (normalize strips), so draw from legal characters only
    legal = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",),
                               blacklist_characters="".join(
                                   chr(c) for c in range(0x20)
                                   if c not in (0x09, 0x0A, 0x0D))),
        max_size=200)

    @settings(max_examples=200, deadline=None)
    @given(content=legal, rot=st.floats(-720, 720, allow_nan=False),
           h=st.floats(0, 1e6, allow_nan=False))
    def check(content, rot, h):
        d = {"attributes": {"color": 2}, "extra_data": {},
             "geometries": {"text": content, "height": h, "rotation": rot}}
        el = ET.fromstring(_text_mark(d, 1.0, 2.0))
        assert (el.text or "") == content
        assert float(el.attrib["font-size"]) > 0

    check()


# ---------------------------------------------------------------------------
# property-based: any finite geometry mix renders to well-formed XML with
# one mark per geometry (pure applyInPandas kernel, no Spark session)
# ---------------------------------------------------------------------------

import pandas as pd  # noqa: E402
from hypothesis import given, settings, strategies as st  # noqa: E402

_c = st.floats(min_value=-1e6, max_value=1e6,
               allow_nan=False, allow_infinity=False)
_pt3 = st.tuples(_c, _c, _c)
_ring = st.lists(_pt3, min_size=3, max_size=8)


@st.composite
def _geom(draw):
    import json as _json

    from dxf_postgis_converter_spark.geometry.wkb import (
        wkb_linestring, wkb_multipolygon, wkb_point, wkb_polygon,
    )
    # XML 1.0 forbids most control chars even escaped — the corpus/DXF
    # text path never produces them, so the fuzz stays in legal space
    _xmltext = st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FA1D,
                                              exclude_categories=("Cs",)),
                       max_size=20)
    kind = draw(st.sampled_from(["point", "line", "poly", "mpoly",
                                 "hatch", "text"]))
    etype, extra, marks = "POINT", {}, 1
    if kind == "point":
        x, y, z = draw(_pt3)
        wkb = wkb_point(x, y, z)
    elif kind == "line":
        wkb = wkb_linestring(draw(st.lists(_pt3, min_size=2, max_size=8)))
        etype = "LINE"
    elif kind == "poly":
        wkb = wkb_polygon(draw(_ring))
        etype = "CIRCLE"
    elif kind == "mpoly":
        rings = draw(st.lists(_ring, min_size=1, max_size=3))
        wkb = wkb_multipolygon(rings)
        etype = "3DFACE"
        marks = len(rings)  # non-filled mpoly: one outline mark per polygon
    elif kind == "hatch":
        wkb = wkb_multipolygon(draw(st.lists(_ring, min_size=1, max_size=3)))
        etype, extra = "HATCH", {"pattern_name": draw(_xmltext)}
    else:
        x, y, z = draw(_pt3)
        wkb = wkb_point(x, y, z)
        etype = "TEXT"
        extra = {"text_content": draw(_xmltext),
                 "height": draw(st.floats(min_value=0.0, max_value=100.0,
                                          allow_nan=False)),
                 "rotation": draw(st.floats(min_value=-360, max_value=360,
                                            allow_nan=False))}
    dj = _json.dumps({"entity_type": etype,
                      "attributes": {"color": draw(st.integers(0, 256)),
                                     "linetype": draw(st.sampled_from(
                                         ["CONTINUOUS", "DASHED", "BYLAYER"]))},
                      "extra_data": extra, "geometries": {}})
    return bytes(wkb), dj, marks


@settings(max_examples=150, deadline=4000)
@given(geoms=st.lists(_geom(), min_size=1, max_size=10))
def test_svg_render_fuzz_wellformed(geoms):
    from dxf_postgis_converter_spark.operators.svg import _render_one

    pdf = pd.DataFrame({"doc_id": ["d"] * len(geoms),
                        "geometry_wkb": [g[0] for g in geoms],
                        "data_json": [g[1] for g in geoms]})
    out = _render_one(pdf)
    assert len(out) == 1
    svg, n = out.iloc[0]["svg"], int(out.iloc[0]["n_elements"])
    root = ET.fromstring(svg)          # well-formed XML, always
    assert n == sum(g[2] for g in geoms)  # n_elements counts SVG marks
    assert "viewBox" in root.attrib
    # every coordinate the renderer emitted is finite (no nan/inf leaks)
    assert "nan" not in svg and "inf" not in svg
