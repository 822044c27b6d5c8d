"""Negative sampling: distributed pool rank + deterministic draws.

The contract that matters at 100 TB: the corruption sample is a pure
function of the triple (md5 draw) and the pool rank is computed with
hash-bucketed prefix sums — so the output is byte-identical at any
partitioning, and no global window appears in the plan.
"""

from pyspark.sql import functions as F

from rdf2smw_spark.operators.negsample import (
    negative_samples,
    ranked_entity_pool,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean"
    )


_ROWS = [
    (f"http://x/s{i}", f"http://x/p{i % 3}", f"http://x/o{i % 7}", True)
    for i in range(40)
] + [
    (f"http://x/s{i}", "http://x/name", f"lit{i}", False) for i in range(5)
]


def test_pool_rank_is_dense_and_complete(spark):
    pool, n = ranked_entity_pool(_triples(spark, _ROWS), n_buckets=8)
    rows = pool.orderBy("rank").collect()
    assert n == 7
    assert [r["rank"] for r in rows] == list(range(7))
    assert sorted(r["entity"] for r in rows) == sorted(
        f"http://x/o{i}" for i in range(7)
    )


def test_draws_deterministic_across_partitioning(spark):
    t = _triples(spark, _ROWS)
    a = negative_samples(t).collect()
    b = negative_samples(t.repartition(13)).collect()
    key = lambda r: (r["subj"], r["pred"], r["obj"], r["j"])
    assert sorted(a, key=key) == sorted(b, key=key)
    # every drawn negative is a real pool entity and never the true object
    for r in a:
        assert r["neg_obj"].startswith("http://x/o")
        assert r["neg_obj"] != r["obj"]


def test_false_negative_filter_drops_colliding_draws(spark):
    t = _triples(spark, _ROWS)
    out = negative_samples(t, n_neg=2)
    n_pos = 40
    n_out = out.count()
    # at most n_neg per positive, strictly fewer iff a draw collided
    assert n_out <= 2 * n_pos
    assert out.filter(F.col("neg_obj") == F.col("obj")).count() == 0


def test_literal_objects_are_never_pool_members_or_positives(spark):
    out = negative_samples(_triples(spark, _ROWS))
    assert out.filter(F.col("pred") == "http://x/name").count() == 0
    assert out.filter(F.col("neg_obj").startswith("lit")).count() == 0


def test_empty_pool_yields_empty_frame(spark):
    t = _triples(spark, [("s", "p", "lit", False)])
    out = negative_samples(t)
    assert out.count() == 0
    assert out.columns == ["subj", "pred", "obj", "j", "neg_obj"]
