"""ByLayer style snapshot (dxf_reader.py:118-144 analogue) and J8
layer-record reconciliation (import_use_case.py:392-417)."""

import json

from pyspark.sql import functions as F

from dxf_postgis_converter_spark.corpus import build_layer_styles, layer_styles
from dxf_postgis_converter_spark.operators.layers import reconcile_layers
from dxf_postgis_converter_spark.operators.styles import snapshot_layer_styles


def _ents(spark, rows):
    data = [(layer, json.dumps({"attributes": {"color": color, "linetype": lt}}))
            for layer, color, lt in rows]
    return spark.createDataFrame(data, "layer string, data_json string")


def test_bylayer_color_resolution(spark):
    styles = layer_styles(spark)
    by_name = {r[0]: r for r in build_layer_styles()}
    ents = _ents(spark, [
        ("Стены", 256, "BYLAYER"),      # both resolve from the layer
        ("Стены", 17, "DASHED"),        # explicit wins
        ("0", 256, "CONTINUOUS"),        # color from layer, linetype kept
    ])
    out = {(r.layer, r.effective_color, r.effective_linetype)
           for r in snapshot_layer_styles(ents, styles).collect()}
    w = by_name["Стены"]
    z = by_name["0"]
    assert ("Стены", w[1], w[2]) in out
    assert ("Стены", 17, "DASHED") in out
    assert ("0", z[1], "CONTINUOUS") in out


def test_styles_cover_all_corpus_layers():
    from dxf_postgis_converter_spark.corpus import LAYERS
    names = {r[0] for r in build_layer_styles()}
    assert names == set(LAYERS)
    colors = [r[1] for r in build_layer_styles()]
    assert all(1 <= c <= 255 for c in colors)  # never the BYLAYER constant


def test_reconcile_layers_actions(spark):
    existing = spark.createDataFrame([
        ("d1", "walls", "cad_v1", "legacy_abc"),   # moved (schema+table)
        ("d1", "roof", "cad", "l1_roof"),          # kept
        ("d1", "old", "cad_v1", "legacy_old"),     # untouched (not incoming)
    ], "doc_id string, name string, schema_name string, table_name string")
    incoming = spark.createDataFrame([
        ("d1", "walls", "cad", "l1_walls"),
        ("d1", "roof", "cad", "l1_roof"),
        ("d1", "doors", "cad", "l1_doors"),        # created
    ], "doc_id string, name string, target_schema string, target_table string")
    out = {r.name: r for r in reconcile_layers(existing, incoming).collect()}
    assert out["walls"].action == "moved"
    assert out["walls"].renamed_from == "cad_v1.legacy_abc"
    assert out["walls"].table_name == "l1_walls" and out["walls"].schema_name == "cad"
    assert out["roof"].action == "kept" and out["roof"].renamed_from is None
    assert out["old"].action == "untouched"
    assert out["old"].table_name == "legacy_old"   # record left alone
    assert out["doors"].action == "created"
    assert out["doors"].table_name == "l1_doors"
    assert len(out) == 4
