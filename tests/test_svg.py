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
