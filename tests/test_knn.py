"""kNN ring-expansion join vs brute-force O(N^2) oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dxf_postgis_converter_spark.operators.knn import knn_join


@pytest.fixture(scope="module")
def knn_data(spark):
    rng = np.random.default_rng(5)
    # clustered + uniform targets so rings resolve at different rounds
    t1 = rng.uniform(0, 8192, size=(400, 2))
    t2 = rng.normal(loc=(1500, 1500), scale=30, size=(100, 2))
    targets = np.vstack([t1, t2])
    probes = rng.uniform(0, 8192, size=(60, 2))
    tdf = spark.createDataFrame(
        [(f"t{i}", float(x), float(y)) for i, (x, y) in enumerate(targets)],
        "target_id string, x double, y double")
    pdf = spark.createDataFrame(
        [(f"p{i}", float(x), float(y)) for i, (x, y) in enumerate(probes)],
        "probe_id string, x double, y double")
    return pdf, tdf, probes, targets


def brute_knn(probes, targets, k):
    exp = {}
    for i, (px, py) in enumerate(probes):
        d = np.hypot(targets[:, 0] - px, targets[:, 1] - py)
        # tie-break by target_id string, matching the engine
        order = sorted(range(len(targets)), key=lambda j: (d[j], f"t{j}"))
        exp[f"p{i}"] = [(f"t{j}", d[j]) for j in order[:k]]
    return exp


@pytest.mark.parametrize("k,res", [(3, 8), (5, 6), (1, 10)])
def test_knn_vs_bruteforce(knn_data, k, res):
    pdf, tdf, probes, targets = knn_data
    got = knn_join(pdf, tdf, k=k, res=res).collect()
    exp = brute_knn(probes, targets, k)
    by_probe = {}
    for r in got:
        by_probe.setdefault(r.probe_id, []).append((r.rank, r.target_id, r.dist))
    assert set(by_probe) == set(exp)
    for pid, rows in by_probe.items():
        rows.sort()
        assert [t for _, t, _ in rows] == [t for t, _ in exp[pid]]
        for (_, _, dg), (_, de) in zip(rows, exp[pid]):
            assert dg == pytest.approx(de, rel=1e-12)
