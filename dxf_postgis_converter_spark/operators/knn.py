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

Skew (the north-star "dense CAD sheet" case): one coarse cell holding
10^5+ targets makes the candidate join itself quadratic for probes in
that cell — no post-join pruning can help because the join OUTPUT is the
cost. The fix is a multi-resolution schedule (`fine_res`): the first
rounds run the same ring expansion at a finer grid, where hot-area
probes resolve against small fine cells (cells × k candidates instead of
cells × 10^5); sparse-area probes simply fail the count test cheaply and
fall through to the coarse rounds. Each round's safe-radius proof is
independent of resolution, so exactness is preserved.

All candidate generation is JVM column arithmetic (k_ring is sequence/
transform algebra); ranking is a per-(probe, cell) top-k prune (the
global top-k is a subset of per-cell top-ks) followed by one row_number
window per round — the engine's only analytic window op (SURVEY §2.6).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.grid import cell_col, cell_size, k_ring_col

_DEBUG = bool(os.environ.get("SPARK_GRAFT_KNN_DEBUG"))

# trace of the most recent knn_join's executed rounds as (res, ring_r)
# tuples — introspection hook for tests/bench asserting the dynamic
# ladder actually cut rounds; "fallback" marks the crossJoin tail
_LAST_SCHEDULE: list = []


def knn_join(
    probes: DataFrame,
    targets: DataFrame,
    k: int,
    res: int = 8,
    probe_id_col: str = "probe_id",
    target_id_col: str = "target_id",
    x_col: str = "x",
    y_col: str = "y",
    max_rounds: int = 24,
    fine_res: int | None | str = "auto",
    hot_cell_threshold: int = 75_000,
) -> DataFrame:
    """-> (probe_id, target_id, dist, rank) with rank in 1..k per probe.

    probes: (probe_id, x, y); targets: (target_id, x, y). Ties broken by
    target_id for determinism. fine_res (> res) prepends a cascade of
    finer-grid rounds — two per level, stepping fine_res, fine_res-2, …
    down to res — the dense-cell fast path (see module doc and the
    ladder note at `levels`). The default "auto" picks the depth from
    the measured hot-cell density (densest fine cell ≈ max(32, 4k)
    targets) and enables the cascade only when the hottest coarse cell
    exceeds hot_cell_threshold targets: fine rounds cost extra rounds of
    fixed overhead, which only pays once a hot cell would otherwise
    flood the candidate join (measured on the bench corpus: 33k-point
    hot cells run 0.9s coarse vs 2.4s fine at sf0.1; a 130k-point sheet
    at 200k probes runs the first round 9.6s with the density-scaled
    depth vs 30s at a fixed +4). The density probe is one
    hash-aggregate over the already-persisted target table."""
    # Resolution ladder: fine_res, fine_res-2, ..., down to res. Two
    # rounds (r=1, 2) per level double the proven safe radius each round
    # with NO gaps — jumping straight from a deep fine level to the
    # coarse grid leaves probes near (but not inside) the dense core
    # unresolved with safe radius ~2 cells, and the first coarse round
    # then joins each of them against the hot cell's ENTIRE population
    # (measured: a 166s round at 200k probes/130k-point sheet). At level
    # L only probes whose 5th-NN exceeds the previous level's safe
    # radius remain, so the hot region's contribution stays bounded.
    auto = fine_res == "auto"
    # deepest even offset the grid supports (res 16 is the global cap);
    # the auto depth below clamps to this SAME bound, so the ladder can
    # always reach the depth the density estimate asks for (ADVICE r4:
    # offsets hard-coded to ≤8 silently topped the ladder out at res+8
    # while the densest-descendant estimate assumed deeper cells)
    max_depth = ((16 - res) // 2) * 2
    if auto:
        # candidate even-offset levels, decided AFTER the density probe —
        # precomputing their (cheap, 8-byte) cell columns lets the probe
        # run on the persisted cache instead of as a second full scan of
        # the target table (scan-bound I/O was ~1/3 of the fit's fixed
        # cost at 200k probes/local[2])
        cand_levels = sorted({res + o for o in range(2, max_depth + 1, 2)},
                             reverse=True)
    elif fine_res:
        cand_levels = []
        L = fine_res
        while L > res:
            cand_levels.append(L)
            L -= 2
    else:
        cand_levels = []
    t = targets.select(
        F.col(target_id_col),
        F.col(x_col).alias("t_x"),
        F.col(y_col).alias("t_y"),
        cell_col(F.col(x_col), F.col(y_col), res).alias(f"cell_{res}"),
        *[cell_col(F.col(x_col), F.col(y_col), ri).alias(f"cell_{ri}")
          for ri in cand_levels],
    ).persist()
    if auto:
        t_probe = time.time() if _DEBUG else 0.0
        # ONE action: materializes the target cache AND answers the
        # density question (at cluster scale this is the query you'd
        # answer from catalog column statistics instead)
        hottest = (t.groupBy(f"cell_{res}").count()
                   .agg(F.max("count")).first()[0] or 0)
        if hottest > hot_cell_threshold:
            # split the hot cell until its densest descendant holds a
            # few dozen targets (assuming near-uniform density inside the
            # sheet — each +1 res divides per-cell population ~4x): ring
            # r=1 then yields ~9·target candidates per hot probe instead
            # of hundreds. A fixed +4 depth left ~325 targets/cell on a
            # 130k-point sheet → ~3k candidates/probe → an 87M-row round-1
            # join at 200k probes, THE wall of the large-probe benchmark.
            import math
            target = max(32, 4 * k)
            depth = max(4, math.ceil(math.log(hottest / target, 4)))
            depth += depth % 2  # even offsets match the precomputed cells
            if depth > max_depth:
                # grid cap reached: the densest fine cell will hold
                # ~4^(depth-max_depth)× more targets than the max(32,4k)
                # design point — say so instead of silently degrading
                if _DEBUG:
                    print(f"[knn] depth {depth} clamped to {max_depth} "
                          f"(res {res}+{max_depth} is the finest grid); "
                          f"hot fine cells ~{4 ** (depth - max_depth)}x "
                          f"denser than the design target", flush=True)
                depth = max_depth
            fine_res = res + depth
        else:
            fine_res = None
        if _DEBUG:
            print(f"[knn] density probe wall={time.time() - t_probe:.2f}s "
                  f"hottest={hottest} fine_res={fine_res}", flush=True)
    levels = sorted({res} | {L for L in cand_levels
                             if fine_res and L <= fine_res}, reverse=True)

    p0 = probes.select(
        F.col(probe_id_col),
        F.col(x_col).alias("p_x"),
        F.col(y_col).alias("p_y"),
    )
    # A probe side arriving in fewer partitions than cores serializes
    # round 1's cell/ring-explode work into those few tasks — a LIMIT
    # upstream (GlobalLimit → ONE partition) made the whole probe prep
    # single-threaded, which measured as a per-probe cost that scaled
    # with input but not with cores (f 6.5s→11.7s going 100k→200k
    # probes, capping 2→8 efficiency at ~0.76). One narrow shuffle of
    # the small probe table restores per-core balance.
    par = probes.sparkSession.sparkContext.defaultParallelism
    if p0.rdd.getNumPartitions() < par:
        p0 = p0.repartition(par * 4)  # 4 task waves smooth stragglers
    unresolved = unresolved0 = p0.select(
        "*",
        *[cell_col(F.col("p_x"), F.col("p_y"), ri).alias(f"p_cell_{ri}") for ri in levels],
    ).persist()

    results = None
    # beyond this ring radius the (2r+1)^2 cell explosion costs more than
    # just scanning all targets for the (by then few) unresolved probes —
    # the fallback is exact and bounds the worst case on sparse targets
    max_ring = 32
    rounds = 0
    # Dynamic ladder schedule (VERDICT r4 item 1a): each round's single
    # materializing action now also returns the done/unresolved COUNTS
    # (see the state checkpoint below), so the ladder can stop paying for
    # levels that resolve nobody. Rules, evaluated after every fine
    # round: skip a level's r=2 when its r=1 resolved <1% of the probes
    # entering the level, and jump straight to the coarse grid when a
    # whole level resolved <1% — by then the dense-core probes (the only
    # reason fine levels exist) are done, and each remaining level would
    # cost its full fixed round overhead to resolve almost nobody.
    # Exactness is untouched: every round's safe-radius proof is
    # independent of which rounds ran before it.
    level_idx, r = 0, 1
    level_entering = None  # probe count entering the current level
    level_done = 0         # probes resolved so far within the level
    min_level_frac = 0.01
    global _LAST_SCHEDULE
    _LAST_SCHEDULE = sched = []
    while rounds < max_rounds:
        res_i = levels[level_idx]
        rounds += 1
        sched.append((res_i, r))
        size_i = cell_size(res_i)
        grid_n = 1 << res_i
        if res_i == res and r > max_ring and r < grid_n:
            sched[-1] = ("fallback", r)
            w = Window.partitionBy(probe_id_col).orderBy(F.col("dist"), F.col(target_id_col))
            rest = (
                unresolved.crossJoin(t.select(target_id_col, "t_x", "t_y"))
                .withColumn("dist", F.sqrt((F.col("p_x") - F.col("t_x")) ** 2
                                           + (F.col("p_y") - F.col("t_y")) ** 2))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(probe_id_col, target_id_col, "dist", "rank")
            )
            # keep the sub-k-targets contract: such probes stay absent
            full = rest.groupBy(probe_id_col).count().filter(F.col("count") == k) \
                .select(probe_id_col)
            # materialize (≤k rows per unresolved probe) so the target
            # cache has no lazy consumer left and can be dropped below —
            # repeated fallback-path calls in a long session leaked t
            # and unresolved0 otherwise (ADVICE r3)
            rest = rest.join(full, probe_id_col, "left_semi").localCheckpoint()
            results = rest if results is None else results.unionByName(rest)
            break
        cand = (
            unresolved
            .withColumn("cell", F.explode(k_ring_col(F.col(f"p_cell_{res_i}"), r)))
            .join(t.select(target_id_col, "t_x", "t_y",
                           F.col(f"cell_{res_i}").alias("cell")), "cell", "inner")
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
        # >= k). This moves the big sort into finer, skew-free
        # (probe, cell) partitions and caps the final window input.
        w_cell = Window.partitionBy(probe_id_col, "cell") \
            .orderBy(F.col("dist"), F.col(target_id_col))
        cand = cand.withColumn("_cr", F.row_number().over(w_cell)) \
            .filter(F.col("_cr") <= k).drop("_cr")
        w = Window.partitionBy(probe_id_col).orderBy(F.col("dist"), F.col(target_id_col))
        # `ranked` is the shared parent of done rows, done_ids and the
        # next round's unresolved set; the done checkpoint below is the
        # round's heavy materialization and pulls it through the cache.
        ranked = cand.withColumn("rank", F.row_number().over(w)) \
            .filter(F.col("rank") <= k).persist()
        safe = float(r) * size_i
        full_ring = r >= grid_n  # ring covers the whole grid: all exact
        per_probe = ranked.groupBy(probe_id_col).agg(
            F.count("*").alias("n_cand"), F.max("dist").alias("kth_dist"))
        done_ids = per_probe.filter(
            (F.col("n_cand") >= k) & ((F.col("kth_dist") <= safe) | F.lit(full_ring))
        ).select(probe_id_col)
        done = ranked.join(done_ids, probe_id_col, "left_semi") \
            .select(probe_id_col, target_id_col, "dist", "rank")
        if res_i == res and full_ring:
            # last possible round: no next unresolved set to carry —
            # materialize the done rows alone
            results_round = done.localCheckpoint()
            results = results_round if results is None \
                else results.unionByName(results_round)
            ranked.unpersist()
            break
        # ONE materialization per round (VERDICT r3 item 6: the former
        # done/unresolved checkpoint PAIR was ~0.3-0.6s/round of pure
        # barrier cost): a single tagged union carries both this round's
        # done rows (_st=1) and the next round's unresolved probes
        # (_st=0); the local checkpoint also truncates lineage — without
        # it the analyzed plan tree doubles per round and OOMs the driver
        # after ~7 rounds (same pattern as components.py). The checkpoint
        # is LAZY and the counting aggregate below is the round's single
        # materializing action (VERDICT r4 item 1b: the former eager
        # checkpoint + isEmpty pair was one extra job of barrier cost per
        # round) — it persists the state RDD and returns the done /
        # unresolved counts that drive both the termination test and the
        # dynamic ladder schedule.
        t_round = time.time() if _DEBUG else 0.0
        next_unresolved = unresolved.join(done_ids, probe_id_col, "left_anti")
        probe_side = [c for c in unresolved.columns if c != probe_id_col]
        state = (
            done.withColumn("_st", F.lit(1))
            .withColumns({c: F.lit(None).cast(unresolved.schema[c].dataType)
                          for c in probe_side})
            .unionByName(
                next_unresolved.withColumn("_st", F.lit(0))
                .withColumns({target_id_col: F.lit(None).cast(
                                  t.schema[target_id_col].dataType),
                              "dist": F.lit(None).cast("double"),
                              "rank": F.lit(None).cast("int")}))
            .localCheckpoint(eager=False)
        )
        cnt = {row["_st"]: row["n"] for row in
               state.groupBy("_st").agg(F.count(F.lit(1)).alias("n")).collect()}
        n_done_rows, n_unres = cnt.get(1, 0), cnt.get(0, 0)
        done_m = state.filter(F.col("_st") == 1) \
            .select(probe_id_col, target_id_col, "dist", "rank")
        results = done_m if results is None else results.unionByName(done_m)
        unresolved = state.filter(F.col("_st") == 0) \
            .select(probe_id_col, *probe_side)
        # both halves are materialized — this round's cache is no longer
        # referenced (long-lived sessions run many queries; leaked caches
        # accumulate)
        ranked.unpersist()
        round_done = n_done_rows // k  # exactly k rows per resolved probe
        if level_entering is None:
            level_entering = round_done + n_unres
        level_done += round_done
        if _DEBUG:
            print(f"[knn] round {rounds} res={res_i} r={r} "
                  f"wall={time.time() - t_round:.2f}s resolved={round_done} "
                  f"unresolved={n_unres}", flush=True)
        if n_unres == 0:
            break
        # schedule advance: coarse rounds double the ring; fine levels
        # run r=2 only while productive, and a dead level (<1% of its
        # entering probes resolved across its rounds) jumps the remaining
        # fine levels entirely — see the ladder note above the loop
        if res_i == res:
            r *= 2
        elif r == 1 and round_done >= min_level_frac * level_entering:
            r = 2
        else:
            if level_done < min_level_frac * level_entering:
                if _DEBUG:
                    print(f"[knn] level {res_i} resolved "
                          f"{level_done}/{level_entering} — skipping to "
                          f"coarse res {res}", flush=True)
                level_idx = len(levels) - 1
            else:
                level_idx += 1
            r = 1
            level_entering = n_unres
            level_done = 0
    # every returned branch is materialized (round checkpoints / fallback
    # checkpoint) — the target cache and the initial probe cache have no
    # remaining consumers on ANY path (unpersist is a safe no-op when the
    # loop never ran)
    t.unpersist()
    unresolved0.unpersist()
    return results if results is not None else probes.sparkSession.createDataFrame(
        [], schema=f"{probe_id_col} string, {target_id_col} string, dist double, rank int")
