"""J8: layer-record reconciliation — re-key layer metadata by
(doc_id, name) on re-import and move the physical table when the target
schema/table changed.

Reference behaviour (import_use_case.py:392-417): for every selected
layer of an incoming document, look up the registered layer record by
(document_id, name) (postgis_layer_repository.py:145-167); if found with
a different (schema_name, table_name), rename the existing physical
table to the new target and update the record; if absent, create the
record. Records for layers not in this import stay untouched.

Spark shape: ONE full-outer shuffle join on the metadata key. The
"physical rename" at lakehouse scale is a metadata-only catalog action
(ALTER TABLE RENAME in Iceberg), so the operator emits it as the
`renamed_from` audit column for the caller's catalog executor — the
reconcile itself never touches data files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_layers(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """existing(doc_id, name, schema_name, table_name) ⟗
    incoming(doc_id, name, target_schema, target_table) →
    (doc_id, name, schema_name, table_name, action, renamed_from)

    action: created (no record yet) | kept (record matches target) |
    moved (record re-pointed; renamed_from = old schema.table) |
    untouched (registered layer not part of this import)."""
    j = existing.alias("e").join(incoming.alias("i"), ["doc_id", "name"], "full_outer")
    same = ((F.col("e.schema_name") == F.col("i.target_schema"))
            & (F.col("e.table_name") == F.col("i.target_table")))
    moved = (F.col("e.table_name").isNotNull() & F.col("i.target_table").isNotNull()
             & ~F.coalesce(same, F.lit(False)))
    return j.select(
        "doc_id", "name",
        F.coalesce("i.target_schema", "e.schema_name").alias("schema_name"),
        F.coalesce("i.target_table", "e.table_name").alias("table_name"),
        F.when(F.col("e.table_name").isNull(), F.lit("created"))
        .when(F.col("i.target_table").isNull(), F.lit("untouched"))
        .when(same, F.lit("kept"))
        .otherwise(F.lit("moved")).alias("action"),
        F.when(moved, F.concat_ws(".", "e.schema_name", "e.table_name"))
        .alias("renamed_from"),
    )
