"""The pure-Python oracle replicas must agree with the Spark operators —
pin the agreement at unit scale so drift is caught before selfcheck."""

from decimal import Decimal

from pyspark.sql import functions as F

from dxf_postgis_converter_spark import replicas

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog.",
    "Стены несущие по оси А-1",
    "short",
    "",
]


def test_simhash_replica_matches_operator(spark):
    from dxf_postgis_converter_spark.operators.dedup import simhash_signatures
    df = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id bigint, text string")
    got = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == replicas.simhash(t), f"simhash drift on {t!r}"


def test_winnow_replica_matches_operator(spark):
    from dxf_postgis_converter_spark.functions.text import winnowing_fingerprints
    df = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id bigint, text string")
    got = {r.doc_id: set(r.fingerprints)
           for r in winnowing_fingerprints(df).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == replicas.winnow_fingerprints(t), f"winnow drift on {t!r}"


def test_round6_matches_spark_half_up(spark):
    vals = [0.0078125, -0.0078125, 1.2345675, 0.1234565, 2.5e-7]
    df = spark.createDataFrame([(v,) for v in vals], "v double") \
        .select(F.round("v", 6).alias("r"))
    got = [r.r for r in df.collect()]
    assert got == [replicas.round6(v) for v in vals]


def test_image_features_replica_matches_operator(spark):
    from dxf_postgis_converter_spark.functions.multimodal import (
        image_features, synthetic_assets,
    )
    feats = image_features(synthetic_assets(spark, 9)).collect()
    want = {r[0]: r for r in replicas.image_feature_rows(9)}
    assert len(feats) == len(want) == 3
    for r in feats:
        acc = 0.0
        for x in r.feature:
            acc += x
        aid, w, h, feat_sum = want[r.asset_id]
        assert (r.width, r.height) == (w, h)
        assert replicas.round6(acc) == feat_sum


def test_lsh_topk_replica_matches_operator(spark):
    from dxf_postgis_converter_spark.operators.similarity import lsh_topk
    import numpy as np
    rng = np.random.default_rng(7)
    emb = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(40)]
    qs = emb[:2]
    corpus = emb[2:]
    e = spark.createDataFrame(corpus, "vec_id bigint, embedding array<double>")
    q = spark.createDataFrame(
        [(i, v) for i, v in qs], "query_id bigint, query_vec array<double>")
    got = sorted((r.query_id, r.vec_id, r.cosine, r.rank)
                 for r in lsh_topk(e, q, k=3, n_planes=6).collect())
    want = sorted(replicas.lsh_topk(corpus, qs, k=3, n_planes=6))
    assert got == want
