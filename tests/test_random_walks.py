"""Deterministic random walks (operators/graph.py random_walks)."""

from pyspark.sql import functions as F

from rdf2smw_spark.operators.graph import random_walks


def _triples(spark, edges):
    rows = [(s, "http://x/p", o, True) for s, o in edges]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean"
    )


def test_walks_follow_real_edges_and_stop_at_sinks(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]  # d is a sink
    eset = set(edges)
    out = random_walks(_triples(spark, edges), walk_len=3).collect()
    walks = {}
    for r in out:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    # every start node with out-edges walks; step 0 is the start itself
    assert set(walks) == {"a", "b", "c"}
    for wid, steps in walks.items():
        assert steps[0] == wid
        ordered = [steps[i] for i in sorted(steps)]
        for u, v in zip(ordered, ordered[1:]):
            assert (u, v) in eset
        # walks are prefix-complete: steps are 0..len-1 with no gaps
        assert sorted(steps) == list(range(len(steps)))


def test_single_out_edge_is_always_taken(spark):
    # a -> b -> c -> d chain: degree 1 everywhere, so the walk is the chain
    out = random_walks(
        _triples(spark, [("a", "b"), ("b", "c"), ("c", "d")]), walk_len=3
    ).collect()
    a_walk = {r["step"]: r["node"] for r in out if r["walk_id"] == "a"}
    assert [a_walk[i] for i in range(4)] == ["a", "b", "c", "d"]


def test_deterministic_across_partitioning(spark):
    edges = [(f"n{i}", f"n{(i * 3 + j) % 20}") for i in range(20) for j in (1, 2, 5)]
    t = _triples(spark, edges)
    a = random_walks(t, walk_len=4).collect()
    b = random_walks(t.repartition(11), walk_len=4).collect()
    key = lambda r: (r["walk_id"], r["step"])
    assert sorted(a, key=key) == sorted(b, key=key)
