"""Real .dxf file ingest (S1/S3): binaryFile source → parse UDF seam.

The reference opens DXF files with ezdxf (dxf_reader.py:19-87: readfile
+ audit, then per-layer entity extraction). This container has no ezdxf,
so — exactly like the multimodal codec seam — the Spark plumbing is real
(binaryFile scan, Arrow-batched parse stage, documents-shaped output)
and the parser itself is behind an import-try: with ezdxf installed the
same job ingests real CAD files; without it the stage raises the
documented NotImplementedError per file, or callers use the synthetic
corpus (corpus.py) which exercises every downstream operator.

Output shape == the engine's canonical input (BASELINE.json input_hint):
documents(doc_id, spans) with one media span per modelspace entity in
iteration order, so ingested files flow through decode/joins/round-trip
unchanged.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..corpus import SPANS_SCHEMA, canonical_media_ref

try:  # pragma: no cover - not installed in this environment
    import ezdxf  # type: ignore

    HAVE_EZDXF = True
except ImportError:
    ezdxf = None
    HAVE_EZDXF = False


def scan_dxf_files(spark: SparkSession, path: str) -> DataFrame:
    """Binary file scan (S3): (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.dxf")
        .load(path)
    )


def spans_from_entity_snapshots(snapshots: list[tuple], layer_styles: dict) -> list[dict]:
    """Pure span builder: [(etype, dxfattribs dict, geom-snapshot dict,
    handle, layer)] → media spans. The geom snapshot is dxfattribs plus
    the collection fields (points/vertices/…) that only geometry
    extraction reads. extra_data is EXACTLY what base_attributes produces
    (dxf_reader.py:105-116 parity: dxftype + dxf_attribs always;
    layer_name + layer_dxf_attribs only when a non-empty ByLayer style
    snapshot exists) — reconstruct.RT_EXTRA_KEYS must keep all of these
    for the round-trip to hold on real ingest (ADVICE r2 medium)."""
    from .extractors import base_attributes, extract_geometries

    spans = []
    for off, (etype, dxfattribs, snapshot, handle, layer) in enumerate(snapshots):
        geoms = extract_geometries(etype, snapshot)
        attributes, extra = base_attributes(dxfattribs, etype, layer_styles)
        ref = canonical_media_ref(
            etype, f"{etype}_{off}", handle or f"{off:x}",
            layer, attributes, geoms, extra)
        spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": off})
    return spans


def _spans_from_dxf(content: bytes, filename: str) -> list[dict]:
    if not HAVE_EZDXF:
        raise NotImplementedError(
            "ezdxf is not available in this environment; install ezdxf to "
            "ingest real .dxf files, or generate the synthetic corpus "
            "(dxf_postgis_converter_spark.corpus)")
    import io

    doc = ezdxf.read(io.StringIO(content.decode("utf-8", "replace")))
    # layer style table for the ByLayer snapshot (dxf_reader.py:118-144)
    layer_styles = {}
    for layer in doc.layers:
        layer_styles[layer.dxf.name] = {
            k: getattr(layer.dxf, k, None)
            for k in ("color", "linetype", "lineweight", "plot",
                      "true_color", "transparency", "ltscale")}
    snapshots = []
    for e in doc.modelspace():
        etype = e.dxftype()
        # snapshot the dxf attribute namespace into a plain dict and run
        # the pure extraction rules (sources/extractors.py — the single
        # golden-tested source of truth for dxf_reader.py:89-720 parity)
        snapshot = dict(e.dxfattribs())
        for extra_field in ("points", "vertices", "control_points", "knots",
                            "paths", "attribs"):
            if hasattr(e, extra_field):
                try:
                    v = getattr(e, extra_field)
                    snapshot[extra_field] = list(v() if callable(v) else v)
                except Exception:
                    pass
        snapshots.append((etype, dict(e.dxfattribs()), snapshot,
                          e.dxf.handle, e.dxf.layer))
    return spans_from_entity_snapshots(snapshots, layer_styles)


def dxf_files_to_documents(files: DataFrame) -> DataFrame:
    """binaryFile rows → documents(doc_id, spans); doc_id = file basename.
    One Arrow batch of whole files at a time (files are MBs, batches stay
    small via maxRecordsPerBatch)."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                doc_id = os.path.splitext(os.path.basename(p))[0]
                rows.append((doc_id, _spans_from_dxf(bytes(content), p)))
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return files.select("path", "content").mapInPandas(gen, schema=SPANS_SCHEMA)


def read_world_file(text: str) -> dict:
    """Parse a 6-line ESRI world file (F8, TransformTools.py:34-90):
    [a, d, b, e, c, f] → affine x' = a·x + b·y + c ; y' = d·x + e·y + f."""
    vals = [float(line.strip()) for line in text.strip().splitlines()[:6]]
    if len(vals) != 6:
        raise ValueError("world file needs 6 numeric lines")
    a, d, b, e, c, f = vals
    return {"a": a, "b": b, "c": c, "d": d, "e": e, "f": f}
