import numpy as np
import pytest

from dxf_postgis_converter_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def sim_data(spark):
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((300, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>").cache()
    qvecs = rng.standard_normal((5, 16))
    qs = spark.createDataFrame(
        [(f"q{i}", [float(x) for x in v]) for i, v in enumerate(qvecs)],
        "query_id string, query_vec array<double>")
    return emb, qs, vecs, qvecs


def brute(vecs, qvecs, k):
    out = {}
    for qi, q in enumerate(qvecs):
        cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
        cos = np.round(cos, 6)
        order = sorted(range(len(vecs)), key=lambda j: (-cos[j], j))
        out[f"q{qi}"] = [(j, cos[j]) for j in order[:k]]
    return out


def test_brute_force_topk_exact(sim_data):
    emb, qs, vecs, qvecs = sim_data
    got = brute_force_topk(emb, qs, k=5).collect()
    exp = brute(vecs, qvecs, 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
    for qid, rows in by_q.items():
        rows.sort()
        assert [v for _, v, _ in rows] == [v for v, _ in exp[qid]]
        for (_, _, cg), (_, ce) in zip(rows, exp[qid]):
            assert cg == pytest.approx(ce, abs=1e-6)


def test_lsh_topk_recall_clustered(spark):
    # ANN is meaningful on clustered data (true neighbors at cos > 0.9) —
    # on isotropic gaussians top-k neighbors are near-orthogonal and any
    # bucketing scheme degrades to random sampling.
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16)) * 3
    vecs, rows = [], []
    for i in range(400):
        c = centers[i % 8]
        v = c + rng.standard_normal(16) * 0.15
        vecs.append(v)
        rows.append((i, [float(x) for x in v]))
    vecs = np.array(vecs)
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    qvecs = np.array([centers[i] + rng.standard_normal(16) * 0.1 for i in range(3)])
    qs = spark.createDataFrame(
        [(f"q{i}", [float(x) for x in v]) for i, v in enumerate(qvecs)],
        "query_id string, query_vec array<double>")
    exact = brute(vecs, qvecs, 10)
    got = lsh_topk(emb, qs, k=10, n_planes=8, multiprobe=True).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = []
    for qid, exp_rows in exact.items():
        exp_ids = {v for v, _ in exp_rows}
        recalls.append(len(by_q.get(qid, set()) & exp_ids) / len(exp_ids))
    assert sum(recalls) / len(recalls) >= 0.9
