"""SVG preview sink (S13): render each document's modelspace to an SVG
string — the reference does this with the ezdxf drawing addon
(dxf_reader.py:724-750 save_svg_preview); here the render is pure
geometry → SVG path text from the WKB we already carry, so it needs no
graphics library and stays fully distributed
(groupBy(doc_id).applyInPandas — one SVG per document, like S12).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geometry.wkb import LINESTRING_Z, MULTIPOLYGON_Z, POINT_Z, POLYGON_Z, parse_wkb

SVG_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("svg", T.StringType()),
    T.StructField("n_elements", T.IntegerType()),
])


def _path_d(ring: np.ndarray, close: bool) -> str:
    pts = " L ".join(f"{x:.3f} {y:.3f}" for x, y in ring[:, :2])
    return f"M {pts}" + (" Z" if close else "")


def _render_one(pdf: pd.DataFrame) -> pd.DataFrame:
    doc_id = pdf["doc_id"].iloc[0]
    parts = []
    xs, ys = [], []
    for wkb in pdf["geometry_wkb"]:
        if wkb is None:
            continue
        code, g = parse_wkb(bytes(wkb))
        if code == POINT_Z:
            x, y = g[0, 0], g[0, 1]
            parts.append(f'<circle cx="{x:.3f}" cy="{y:.3f}" r="0.5"/>')
            xs.append(x), ys.append(y)
        elif code == LINESTRING_Z:
            parts.append(f'<path fill="none" d="{_path_d(g, False)}"/>')
            xs.extend(g[:, 0]), ys.extend(g[:, 1])
        elif code == POLYGON_Z:
            parts.append(f'<path d="{_path_d(g[0], True)}"/>')
            xs.extend(g[0][:, 0]), ys.extend(g[0][:, 1])
        elif code == MULTIPOLYGON_Z:
            for poly in g:
                parts.append(f'<path d="{_path_d(poly[0], True)}"/>')
                xs.extend(poly[0][:, 0]), ys.extend(poly[0][:, 1])
    if xs:
        x0, y0, x1, y1 = min(xs), min(ys), max(xs), max(ys)
        pad = 0.05 * max(x1 - x0, y1 - y0, 1.0)
        vb = f"{x0 - pad:.3f} {y0 - pad:.3f} {x1 - x0 + 2 * pad:.3f} {y1 - y0 + 2 * pad:.3f}"
    else:
        vb = "0 0 1 1"
    svg = (f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="{vb}">'
           + "".join(parts) + "</svg>")
    return pd.DataFrame([{"doc_id": doc_id, "svg": svg, "n_elements": len(parts)}])


def svg_previews(entities: DataFrame) -> DataFrame:
    """entities → one (doc_id, svg, n_elements) row per document."""
    return (
        entities.select("doc_id", "geometry_wkb")
        .groupBy("doc_id")
        .applyInPandas(_render_one, schema=SVG_SCHEMA)
    )
