"""ByLayer style fidelity: snapshot the source layer's style onto each
entity and resolve ByLayer attributes.

The reference preserves each entity's source-layer style so ByLayer
entities keep their visual appearance after TABLES reconstruction
(dxf_reader.py:118-144 stores layer_dxf_attribs in extra_data;
tests/test_integration.py:915-954 asserts the snapshot round-trips).
Here the layer styles live in their own small dimension table
(corpus.layer_styles — the TABLES-section analogue) and the snapshot is
a broadcast hash join plus two CASE expressions — pure JVM, no Python,
no shuffle of the big side.

ACI semantics: entity color 256 means BYLAYER (the AutoCAD constant) and
resolves to the layer's color; linetype "BYLAYER" resolves to the
layer's linetype. Everything else passes through unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACI_BYLAYER = 256


def snapshot_layer_styles(entities: DataFrame, styles: DataFrame) -> DataFrame:
    """entities (with data_json carrying attributes) ⋈ layer-style dim →
    entities + layer_* snapshot columns + effective_color /
    effective_linetype (ByLayer resolved)."""
    color = F.get_json_object("data_json", "$.attributes.color").cast("int")
    ltype = F.get_json_object("data_json", "$.attributes.linetype")
    s = F.broadcast(styles.select(
        "layer", "layer_color", "layer_linetype", "layer_lineweight", "layer_plot"))
    return (
        entities.join(s, "layer", "left")
        .withColumn("effective_color",
                    F.when(color == ACI_BYLAYER, F.col("layer_color")).otherwise(color))
        .withColumn("effective_linetype",
                    F.when(ltype == "BYLAYER", F.col("layer_linetype")).otherwise(ltype))
    )
