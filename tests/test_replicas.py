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


def _poly_zone_rows():
    from dxf_postgis_converter_spark.corpus import build_zones
    z = build_zones()
    return z[z["kind"].isin(["circle", "poly"])]


def test_poly_zone_winding_replica_vs_engine_kernel():
    """The winding-number oracle replica must agree with the engine's
    even-odd WKB ray-cast kernel on every corpus circle/star zone, over a
    point set that includes exact ring vertices and edge midpoints —
    different algorithm family, different data path, same verdicts."""
    import numpy as np
    from dxf_postgis_converter_spark import replicas
    from dxf_postgis_converter_spark.geometry.predicates import points_covered
    from dxf_postgis_converter_spark.geometry.wkb import parse_wkb

    for _, z in _poly_zone_rows().iterrows():
        ring = replicas._zone_ring(z["kind"], z["params_json"])
        if np.array_equal(ring[0], ring[-1]):
            ring = ring[:-1]
        rng = np.random.default_rng(11)
        gx = rng.uniform(z["xmin"] - 50, z["xmax"] + 50, 300)
        gy = rng.uniform(z["ymin"] - 50, z["ymax"] + 50, 300)
        mid = (ring + np.roll(ring, -1, axis=0)) / 2.0
        px = np.concatenate([gx, ring[:, 0], mid[:, 0]])
        py = np.concatenate([gy, ring[:, 1], mid[:, 1]])
        pts = [(f"d{i}", f"h{i}", float(x), float(y))
               for i, (x, y) in enumerate(zip(px, py))]
        got = {h for _, h, _ in replicas.pip_poly_zone_rows(
            pts, [(z["zone_id"], z["kind"], z["params_json"])])}
        _, geom = parse_wkb(bytes(z["geometry_wkb"]))
        eng = points_covered(px, py, geom)
        want = {f"h{i}" for i in np.nonzero(eng)[0]}
        assert got == want, (z["zone_id"], got ^ want)
        # every vertex and midpoint is ON the boundary → covered
        n_grid = len(gx)
        assert {f"h{i}" for i in range(n_grid, len(pts))} <= got


def test_poly_zone_replica_catches_boundary_mutation():
    """Deliberate engine-side mutation (dropping boundary inclusion —
    VERDICT r4 item 5's example): the winding replica must flag it on
    boundary points, proving the oracle is not a blind twin."""
    import numpy as np
    from dxf_postgis_converter_spark import replicas
    from dxf_postgis_converter_spark.geometry.predicates import _ring_crossings

    z = _poly_zone_rows()[lambda d: d["kind"] == "poly"].iloc[0]
    ring = replicas._zone_ring(z["kind"], z["params_json"])
    mid = (ring + np.roll(ring, -1, axis=0)) / 2.0
    px = np.concatenate([ring[:, 0], mid[:, 0]])
    py = np.concatenate([ring[:, 1], mid[:, 1]])
    pts = [(f"d{i}", f"h{i}", float(x), float(y))
           for i, (x, y) in enumerate(zip(px, py))]
    got = {h for _, h, _ in replicas.pip_poly_zone_rows(
        pts, [(z["zone_id"], z["kind"], z["params_json"])])}
    crossings, _ = _ring_crossings(px, py, ring)  # mutated: on_edge dropped
    mutated = {f"h{i}" for i in np.nonzero(crossings % 2 == 1)[0]}
    assert got - mutated, "mutation not caught: boundary points lost"
