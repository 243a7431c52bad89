"""Real .dxf file ingest (S1/S3): binaryFile source → parse UDF stage.

The reference opens DXF files with ezdxf (dxf_reader.py:19-87: readfile
+ audit, then per-layer entity extraction). Here the Spark plumbing is
the same either way (binaryFile scan, Arrow-batched parse stage,
documents-shaped output) and the parser has two engines: ezdxf when
installed (audit/recovery, binary DXF, real-world quirks), else the
built-in pure-Python ASCII tag codec (sources/dxf_parser.py) — so
`.dxf` ingest is fully functional in this container, no external
library required. Both engines feed the same golden-tested extraction
rules (sources/extractors.py).

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


def serialize_block_entities(block_name: str, block_defs: dict | None,
                             _path: set | None = None) -> list[dict]:
    """Recursive block-definition serialization with a recursion-path
    cycle guard — dxf_reader.py:376-424 parity: each payload carries
    dxftype/dxf_attribs/attributes/geometries, and nested INSERTs embed
    their own closure (empty when the path revisits a block)."""
    from .extractors import base_attributes, extract_geometries

    if not block_defs or block_name not in block_defs:
        return []
    path = _path if _path is not None else set()
    if block_name in path:
        return []
    path.add(block_name)
    try:
        serialized = []
        for etype, dxfattribs, snapshot, _handle, _layer in block_defs[block_name]:
            geoms = extract_geometries(etype, snapshot)
            attributes, extra = base_attributes(dxfattribs, etype, None)
            payload = {
                "dxftype": etype,
                "dxf_attribs": dict(extra.get("dxf_attribs", {})),
                "attributes": dict(attributes),
                "geometries": dict(geoms),
            }
            if etype == "INSERT":
                nested = str(snapshot.get("name", "") or "")
                if nested:
                    payload["block_name"] = nested
                    payload["block_entities"] = serialize_block_entities(
                        nested, block_defs, path) or []
            serialized.append(payload)
        return serialized
    finally:
        path.discard(block_name)


def spans_from_entity_snapshots(snapshots: list[tuple], layer_styles: dict,
                                block_defs: dict | None = None) -> list[dict]:
    """Pure span builder: [(etype, dxfattribs dict, geom-snapshot dict,
    handle, layer)] → media spans. The geom snapshot is dxfattribs plus
    the collection fields (points/vertices/…) that only geometry
    extraction reads. extra_data is EXACTLY what base_attributes produces
    (dxf_reader.py:105-116 parity: dxftype + dxf_attribs always;
    layer_name + layer_dxf_attribs only when a non-empty ByLayer style
    snapshot exists) — reconstruct.RT_EXTRA_KEYS must keep all of these
    for the round-trip to hold on real ingest (ADVICE r2 medium) — plus,
    for INSERT, block_name and the recursively serialized
    block_entities closure (dxf_reader.py:369-372)."""
    from .extractors import base_attributes, extract_geometries

    spans = []
    for off, (etype, dxfattribs, snapshot, handle, layer) in enumerate(snapshots):
        geoms = extract_geometries(etype, snapshot)
        attributes, extra = base_attributes(dxfattribs, etype, layer_styles)
        if etype == "INSERT":
            bname = str(geoms.get("name", "") or "")
            extra["block_name"] = bname
            extra["block_entities"] = serialize_block_entities(
                bname, block_defs) or []
        ref = canonical_media_ref(
            etype, f"{etype}_{off}", handle or f"{off:x}",
            layer, attributes, geoms, extra)
        spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": off})
    return spans


def _snapshot_ezdxf_entity(e) -> tuple:
    """ezdxf entity → the plain (etype, dxfattribs, snapshot, handle,
    layer) tuple the pure extraction rules consume (sources/extractors.py
    — the single golden-tested source of truth for dxf_reader.py:89-720
    parity)."""
    etype = e.dxftype()
    snapshot = dict(e.dxfattribs())
    for extra_field in ("points", "vertices", "control_points", "knots",
                        "paths", "attribs"):
        if hasattr(e, extra_field):
            try:
                v = getattr(e, extra_field)
                snapshot[extra_field] = list(v() if callable(v) else v)
            except Exception:
                pass
    return (etype, dict(e.dxfattribs()), snapshot, e.dxf.handle, e.dxf.layer)


def _spans_from_dxf(content: bytes, filename: str) -> list[dict]:
    if not HAVE_EZDXF:
        # pure-Python ASCII tag codec (dxf_parser.py) — same snapshot
        # shape, same extraction rules, no external library
        from .dxf_parser import parse_dxf

        layer_styles, snapshots, block_defs = parse_dxf(
            content.decode("utf-8", "replace"))
        return spans_from_entity_snapshots(snapshots, layer_styles, block_defs)
    import io

    doc = ezdxf.read(io.StringIO(content.decode("utf-8", "replace")))
    # layer style table for the ByLayer snapshot (dxf_reader.py:118-144)
    layer_styles = {}
    for layer in doc.layers:
        layer_styles[layer.dxf.name] = {
            k: getattr(layer.dxf, k, None)
            for k in ("color", "linetype", "lineweight", "plot",
                      "true_color", "transparency", "ltscale")}
    snapshots = [_snapshot_ezdxf_entity(e) for e in doc.modelspace()]
    # block definitions for the INSERT block_entities closure
    # (dxf_reader.py:369-400; layout pseudo-blocks skipped)
    block_defs = {}
    try:
        for blk in doc.blocks:
            bname = str(blk.name)
            if bname.startswith("*"):
                continue
            block_defs[bname] = [_snapshot_ezdxf_entity(be) for be in blk]
    except Exception:
        pass
    return spans_from_entity_snapshots(snapshots, layer_styles, block_defs)


def dxf_files_to_documents(files: DataFrame, on_error: str = "raise") -> DataFrame:
    """binaryFile rows → documents(doc_id, spans); doc_id = file basename.
    One Arrow batch of whole files at a time (files are MBs, batches stay
    small via maxRecordsPerBatch).

    on_error: "raise" fails the job on the first unparseable file
    (strict; default), "skip" drops bad files and keeps the job alive —
    the reference's per-file Result-error behavior
    (open_document_use_case.py:27-57 reports and moves on), and the
    right mode for bulk ingest where one corrupt file among millions
    must not abort the whole run."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def gen(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                doc_id = os.path.splitext(os.path.basename(p))[0]
                try:
                    rows.append((doc_id, _spans_from_dxf(bytes(content), p)))
                except Exception:
                    if on_error == "raise":
                        raise
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
