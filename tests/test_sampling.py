"""Deterministic stratified sampling + sequence packing."""

import hashlib

from dxf_postgis_converter_spark.operators.sampling import (
    pack_sequences, stratified_sample,
)


def test_stratified_sample_deterministic(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out1 = sorted((r.doc_id, r.source) for r in stratified_sample(df, "source", 3).collect())
    out2 = sorted((r.doc_id, r.source) for r in stratified_sample(df, "source", 3).collect())
    assert out1 == out2 and len(out1) == 6
    # matches the md5-order contract
    for src in ("a", "b"):
        ids = [i for i, s in rows if s == src]
        want = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:3]
        assert sorted(i for i, s in out1 if s == src) == sorted(want)


def test_stratified_sample_small_stratum(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")],
                               "doc_id bigint, source string")
    assert stratified_sample(df, "source", 5).count() == 3  # min(n, size)


def test_pack_sequences_layout(spark):
    # tokens: 1000, 1500, 600, 2048, 1 laid end-to-end, budget 2048
    df = spark.createDataFrame(
        [(1, "s", 1000), (2, "s", 1500), (3, "s", 600), (4, "s", 2048), (5, "s", 1)],
        "doc_id bigint, source string, tok int")
    out = {r.doc_id: (r.seq_id, r.seq_offset)
           for r in pack_sequences(df, "tok", 2048).collect()}
    assert out[1] == (0, 0)          # starts sequence 0
    assert out[2] == (0, 1000)       # starts in seq 0, spans into 1
    assert out[3] == (1, 452)        # 2500 cumulative -> seq 1 offset 452
    assert out[4] == (1, 1052)       # spans 1 -> 2
    assert out[5] == (2, 1052)       # 5148 cumulative
    # partitions pack independently
    df2 = df.union(spark.createDataFrame([(9, "t", 7)],
                                         "doc_id bigint, source string, tok int"))
    out2 = {r.doc_id: (r.seq_id, r.seq_offset)
            for r in pack_sequences(df2, "tok", 2048).collect()}
    assert out2[9] == (0, 0)
