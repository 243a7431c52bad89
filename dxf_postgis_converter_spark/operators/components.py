"""Connected components over a pair graph — the step that turns
near-duplicate PAIRS (minhash/simhash/embedding output) into dedup
GROUPS with one canonical survivor per group, which is what a
training-data pipeline actually executes (drop all but one doc per
component).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round takes the min label over itself and its
neighbors; fixpoint when no label changes. Converges in O(component
diameter) rounds — near-dup clusters are shallow (duplicates of a
common ancestor), so 2-4 rounds in practice; max_iter bounds pathology.

Scale shape per round: one shuffle join (labels ⋈ symmetric edges) +
one groupBy min — both keyed on node id, map-side combinable. Labels
are localCheckpoint'ed each round so the logical plan stays flat
(the same driver-OOM guard as index/skew.py's adaptive split loop);
the convergence check rides the checkpoint action, costing no extra
pass. For graphs with deep chains swap propagation for the
large-star/small-star contraction (Kiveris et al.) — same join
primitives, O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """edges(src, dst) undirected → (id, component) with component = the
    minimum node id reachable from `id` (a canonical, join-stable group
    key). Nodes = every endpoint appearing in edges."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    labels = (sym.select(F.col("s").alias("id")).distinct()
              .withColumn("component", F.col("id"))
              .localCheckpoint())
    for _ in range(max_iter):
        nb = (sym.join(labels.withColumnRenamed("id", "d_id"),
                       sym.d == F.col("d_id"))
              .groupBy(F.col("s").alias("id"))
              .agg(F.min("component").alias("nb_component")))
        new = (labels.join(nb, "id", "left")
               .select("id",
                       F.least(F.col("component"),
                               F.coalesce("nb_component", "component"))
                       .alias("component"))
               .localCheckpoint())
        changed = (new.alias("n").join(labels.alias("o"), "id")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new
        if changed == 0:
            break
    return labels


def dedup_groups(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Near-dup pairs → (doc_id, group_id, is_survivor): one survivor
    (the min id) per connected component."""
    comp = connected_components(pairs, src, dst)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("group_id"),
        (F.col("id") == F.col("component")).alias("is_survivor"))
