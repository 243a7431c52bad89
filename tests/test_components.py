"""Connected components / dedup groups over near-dup pair graphs."""

from pyspark.sql import functions as F

from dxf_postgis_converter_spark.operators.components import (
    connected_components, dedup_groups,
)


def test_components_basic(spark):
    # two components: {1,2,3,4} (chain) and {10,11}; 20-21-22 triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a bigint, id_b bigint")
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_components_deep_chain_converges(spark):
    # a 16-node path exercises multi-round propagation (diameter 15)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(16)], "id_a bigint, id_b bigint")
    comp = connected_components(edges)
    assert comp.filter(F.col("component") != 0).count() == 0
    assert comp.count() == 17


def test_dedup_groups_survivor(spark):
    edges = spark.createDataFrame([(5, 9), (9, 7)], "id_a bigint, id_b bigint")
    rows = {r.doc_id: r for r in dedup_groups(edges).collect()}
    assert all(r.group_id == 5 for r in rows.values())
    assert rows[5].is_survivor and not rows[7].is_survivor and not rows[9].is_survivor


def test_star_contraction_matches_propagation_on_random_graphs(spark):
    """Star-contraction (the default) vs the r2 label-propagation twin on
    a seeded random graph — identical labelings."""
    import random

    from dxf_postgis_converter_spark.operators.components import _label_propagation

    rng = random.Random(42)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    a = {r.id: r.component for r in connected_components(df).collect()}
    b = {r.id: r.component for r in _label_propagation(df).collect()}
    assert a == b


def test_long_chain_beyond_propagation_budget(spark):
    """A 200-node path has diameter 199 — label propagation inside a
    50-round budget would stop early with wrong labels; star contraction
    needs only O(log n) rounds and must label the whole chain 0."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a bigint, id_b bigint")
    comp = connected_components(edges, max_iter=12)
    assert comp.count() == 200
    assert comp.filter(F.col("component") != 0).count() == 0


def test_self_loops_and_isolated_labels(spark):
    edges = spark.createDataFrame(
        [(7, 7), (1, 2)], "id_a bigint, id_b bigint")
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {7: 7, 1: 1, 2: 1}
