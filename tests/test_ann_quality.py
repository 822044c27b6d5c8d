"""IVF recall report + hard-negative mining (operators/similarity.py)."""

import math

from pyspark.sql import functions as F

from rdf2smw_spark.operators.similarity import (
    HARD_NEG_HI,
    HARD_NEG_LO,
    ann_topk_bruteforce,
    hard_negatives,
    ivf_recall,
)

DIM = 64


def _clustered_emb(spark, n_clusters=4, per_cluster=12):
    """Deterministic clustered vectors: cluster c concentrates its mass
    on axes [c*8, c*8+8) with a small per-vector perturbation, so
    within-cluster cosines are high and cross-cluster cosines are low.
    vec_id = i * n_clusters + c interleaves the clusters so the first
    n_lists vectors (the IVF seed centroids) land one per cluster."""
    rows = []
    for c in range(n_clusters):
        for i in range(per_cluster):
            v = [0.0] * DIM
            for d in range(8):
                v[c * 8 + d] = 1.0 + 0.01 * ((i * 7 + d) % 5)
            v[(c * 8 + i) % DIM] += 0.05
            rows.append((i * n_clusters + c, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_recall_bounds_and_exact_when_probing_everything(spark):
    emb = _clustered_emb(spark)
    out = ivf_recall(emb, n_queries=6, k=3, n_lists=4, n_probe=4).collect()
    assert len(out) == 6
    for r in out:
        assert r["n_exact"] == 3
        assert 0 <= r["n_hit"] <= r["n_exact"]
        assert r["recall_e6"] == r["n_hit"] * 1_000_000 // r["n_exact"]
    # probing ALL lists makes IVF exhaustive -> recall must be 1.0
    assert all(r["recall_e6"] == 1_000_000 for r in out)


def test_ivf_recall_on_clustered_data_with_partial_probes(spark):
    emb = _clustered_emb(spark)
    out = ivf_recall(emb, n_queries=6, k=3, n_lists=4, n_probe=2).collect()
    # neighbors live in the query's own cluster, which IVF always probes
    # first -> near-perfect recall even at n_probe < n_lists
    mean = sum(r["recall_e6"] for r in out) / len(out)
    assert mean >= 900_000


def test_hard_negatives_band_and_rank(spark):
    emb = _clustered_emb(spark)
    out = hard_negatives(
        emb, n_queries=6, k=3, pool_k=40, n_lists=4, n_probe=4
    ).collect()
    for r in out:
        assert HARD_NEG_LO <= r["cosine"] < HARD_NEG_HI
        assert 1 <= r["rank"] <= 3
    # ranks are dense per query and ordered by descending cosine
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_hard_negatives_excludes_near_dup_positives(spark):
    emb = _clustered_emb(spark)
    # within-cluster cosines are ~0.99 -> all true positives must be
    # excluded by the hi bound; everything mined is cross-cluster
    exact = ann_topk_bruteforce(emb, n_queries=6, k=3)
    positives = {
        (r["query_id"], r["neighbor_id"])
        for r in exact.filter(F.col("cosine") >= HARD_NEG_HI).collect()
    }
    mined = {
        (r["query_id"], r["neighbor_id"])
        for r in hard_negatives(
            emb, n_queries=6, k=3, pool_k=40, n_lists=4, n_probe=4
        ).collect()
    }
    assert positives and not (positives & mined)


def test_hard_negatives_deterministic_across_partitioning(spark):
    emb = _clustered_emb(spark)
    a = hard_negatives(emb, n_queries=6, k=3, n_lists=4, n_probe=4).collect()
    b = hard_negatives(
        emb.repartition(9), n_queries=6, k=3, n_lists=4, n_probe=4
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(a, key=key) == sorted(b, key=key)
