"""J9 block-definition closure: frontier expansion, cycle guard, parity
with a pure-Python BFS oracle."""

import pytest

from dxf_postgis_converter_spark.operators.blocks import (
    block_closure,
    insert_roots,
    reachable_blocks,
)

EDGES = [
    # DOOR -> HANDLE -> SCREW ; FRAME_A -> {BOLT_M12, FRAME_B} ; cycle A<->B
    ("DOOR", "HANDLE"), ("HANDLE", "SCREW"),
    ("FRAME_A", "BOLT_M12"), ("FRAME_A", "FRAME_B"), ("FRAME_B", "FRAME_A"),
    ("TREE", "LEAF"),
]


def _bfs(roots, edges):
    adj = {}
    for p, c in edges:
        adj.setdefault(p, []).append(c)
    seen = set(roots)
    stack = list(roots)
    while stack:
        b = stack.pop()
        for c in adj.get(b, []):
            if c not in seen:
                seen.add(c)
                stack.append(c)
    return seen


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "parent string, child string")


def test_closure_matches_bfs_oracle(spark, edges_df):
    roots = spark.createDataFrame(
        [("d1", "DOOR"), ("d1", "TREE"), ("d2", "FRAME_A")],
        "doc_id string, block string")
    got = {(r.doc_id, r.block) for r in block_closure(roots, edges_df).collect()}
    expect = {("d1", b) for b in _bfs({"DOOR", "TREE"}, EDGES)} \
        | {("d2", b) for b in _bfs({"FRAME_A"}, EDGES)}
    assert got == expect
    # the A<->B cycle terminated and both members are present exactly once
    assert ("d2", "FRAME_A") in got and ("d2", "FRAME_B") in got


def test_cycle_only_graph_terminates(spark):
    edges = spark.createDataFrame([("A", "B"), ("B", "C"), ("C", "A")],
                                  "parent string, child string")
    roots = spark.createDataFrame([("d", "A")], "doc_id string, block string")
    got = {r.block for r in block_closure(roots, edges).collect()}
    assert got == {"A", "B", "C"}


def test_roots_from_decoded_entities(entities_df, spark, edges_df):
    roots = insert_roots(entities_df)
    assert roots.count() > 0
    names = {r.block for r in roots.collect()}
    assert names <= {"DOOR", "WINDOW", "BOLT_M12", "FRAME_A", "FRAME_B", "TREE", "NORTH_ARROW"}
    closure = reachable_blocks(entities_df, edges_df)
    # closure ⊇ roots, per doc
    assert closure.count() >= roots.count()
    assert roots.exceptAll(closure).count() == 0
