"""kNN join (J11) — iterative cell-ring expansion + windowed top-k.

For each probe point, the k nearest target points. Algorithm (SURVEY §4.3
"kNN ring expansion loop — driver-side iterative algorithm"):

  round r (r = 1, 2, 4, ... doubling):
    candidates = unresolved probes ⋈ targets on cell ∈ k_ring(probe_cell, r)
    a probe is RESOLVED when ≥ k candidates lie within the safe radius
    r·cell_size (any target outside the ring is farther than that bound,
    so those k are provably the true nearest)
  unresolved probes re-enter with doubled r; once the ring covers the whole
  grid every probe resolves (guaranteed termination when ≥k targets exist).

All candidate generation is JVM column arithmetic (k_ring is sequence/
transform algebra); ranking is one row_number window per round — the
engine's only analytic window op (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.grid import cell_col, cell_size, k_ring_col


def knn_join(
    probes: DataFrame,
    targets: DataFrame,
    k: int,
    res: int = 8,
    probe_id_col: str = "probe_id",
    target_id_col: str = "target_id",
    x_col: str = "x",
    y_col: str = "y",
    max_rounds: int = 12,
) -> DataFrame:
    """-> (probe_id, target_id, dist, rank) with rank in 1..k per probe.

    probes: (probe_id, x, y); targets: (target_id, x, y). Ties broken by
    target_id for determinism.
    """
    size = cell_size(res)
    t = targets.select(
        F.col(target_id_col),
        F.col(x_col).alias("t_x"),
        F.col(y_col).alias("t_y"),
        cell_col(F.col(x_col), F.col(y_col), res).alias("cell"),
    )
    # targets are reused every round — materialize once
    t = t.persist()
    t.count()

    unresolved = probes.select(
        F.col(probe_id_col),
        F.col(x_col).alias("p_x"),
        F.col(y_col).alias("p_y"),
        cell_col(F.col(x_col), F.col(y_col), res).alias("p_cell"),
    ).persist()

    results = None
    r = 1
    grid_n = 1 << res
    # beyond this ring radius the (2r+1)^2 cell explosion costs more than
    # just scanning all targets for the (by then few) unresolved probes —
    # the fallback is exact and bounds the worst case on sparse targets
    max_ring = 32
    for _ in range(max_rounds):
        if unresolved.isEmpty():
            break
        if r > max_ring and r < grid_n:
            w = Window.partitionBy(probe_id_col).orderBy(F.col("dist"), F.col(target_id_col))
            rest = (
                unresolved.crossJoin(t.drop("cell"))
                .withColumn("dist", F.sqrt((F.col("p_x") - F.col("t_x")) ** 2
                                           + (F.col("p_y") - F.col("t_y")) ** 2))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(probe_id_col, target_id_col, "dist", "rank")
            )
            # keep the sub-k-targets contract: such probes stay absent
            full = rest.groupBy(probe_id_col).count().filter(F.col("count") == k) \
                .select(probe_id_col)
            rest = rest.join(full, probe_id_col, "left_semi")
            results = rest if results is None else results.unionByName(rest)
            break
        cand = (
            unresolved
            .withColumn("cell", F.explode(k_ring_col(F.col("p_cell"), r)))
            .join(t, "cell", "inner")
            .withColumn(
                "dist",
                F.sqrt((F.col("p_x") - F.col("t_x")) ** 2 + (F.col("p_y") - F.col("t_y")) ** 2),
            )
            # same target can surface via several ring cells only at the
            # clipped border — k_ring dedups, so pairs are unique
        )
        # two-level top-k: prune to the k nearest per (probe, cell) first —
        # the global top-k is a subset of the per-cell top-ks, and the
        # count test below survives (sum(min(c_i, k)) >= k iff sum(c_i)
        # >= k). In dense CAD-sheet cells this cuts the per-probe window
        # input from cells x cell_population to cells x k and moves the
        # big sort into finer, skew-free (probe, cell) partitions.
        w_cell = Window.partitionBy(probe_id_col, "cell") \
            .orderBy(F.col("dist"), F.col(target_id_col))
        cand = cand.withColumn("_cr", F.row_number().over(w_cell)) \
            .filter(F.col("_cr") <= k).drop("_cr")
        w = Window.partitionBy(probe_id_col).orderBy(F.col("dist"), F.col(target_id_col))
        ranked = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        safe = float(r) * size
        full_ring = r >= grid_n  # ring covers the whole grid: all exact
        per_probe = ranked.groupBy(probe_id_col).agg(
            F.count("*").alias("n_cand"), F.max("dist").alias("kth_dist"))
        done_ids = per_probe.filter(
            (F.col("n_cand") >= k) & ((F.col("kth_dist") <= safe) | F.lit(full_ring))
        ).select(probe_id_col)
        done = ranked.join(done_ids, probe_id_col, "left_semi") \
            .select(probe_id_col, target_id_col, "dist", "rank")
        done = done.persist()
        done.count()
        results = done if results is None else results.unionByName(done)
        unresolved = unresolved.join(done_ids, probe_id_col, "left_anti").persist()
        if full_ring:
            break
        r *= 2
    return results if results is not None else probes.sparkSession.createDataFrame(
        [], schema=f"{probe_id_col} string, {target_id_col} string, dist double, rank int")
