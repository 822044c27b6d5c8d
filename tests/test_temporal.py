"""Temporal fact intervals (operators/temporal.py) and DeepWalk
skip-gram co-occurrence (operators/graph.py walk_cooccurrence)."""

import datetime as dt

import duckdb

from rdf2smw_spark.operators.graph import walk_cooccurrence, walk_cooccurrence_sql
from rdf2smw_spark.operators.temporal import fact_intervals, fact_intervals_sql


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


CLAIM_SCHEMA = "subj string, pred string, obj string, ts timestamp"
CLAIMS = [
    # s1: x, x, y, x -> three islands (x re-appearing starts a NEW one)
    ("s1", "p", "x", _ts(1)),
    ("s1", "p", "x", _ts(2)),
    ("s1", "p", "y", _ts(3)),
    ("s1", "p", "x", _ts(4)),
    # s2: single observation
    ("s2", "p", "z", _ts(5)),
]


def test_fact_intervals_islands(spark):
    out = fact_intervals(spark.createDataFrame(CLAIMS, CLAIM_SCHEMA)).toPandas()
    s1 = out[out.subj == "s1"].sort_values("version_no")
    assert list(s1.obj) == ["x", "y", "x"]
    assert list(s1.n_obs) == [2, 1, 1]
    first = s1.iloc[0]
    assert first.valid_from == _ts(1) and first.valid_to == _ts(2)
    s2 = out[out.subj == "s2"].iloc[0]
    assert (s2.obj, s2.n_obs, s2.version_no) == ("z", 1, 1)


def test_fact_intervals_same_ts_tiebreak(spark):
    # two objs at the SAME ts: (ts, obj) order makes 'a' precede 'b'
    # deterministically on both engines
    rows = [("s", "p", "b", _ts(1)), ("s", "p", "a", _ts(1))]
    sdf = fact_intervals(spark.createDataFrame(rows, CLAIM_SCHEMA))
    got = sorted((r.obj, r.version_no) for r in sdf.collect())
    assert got == [("a", 1), ("b", 2)]
    sql = fact_intervals_sql(
        "(SELECT * FROM (VALUES ('s','p','b',TIMESTAMP '2024-01-01 01:00:00'),"
        " ('s','p','a',TIMESTAMP '2024-01-01 01:00:00'))"
        " AS t(subj, pred, obj, ts))"
    )
    want = sorted(
        (r[2], r[3]) for r in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


WALKS = [
    # walk w1: a -> b -> c -> d ; walk w2: a -> c
    ("w1", 0, "a"), ("w1", 1, "b"), ("w1", 2, "c"), ("w1", 3, "d"),
    ("w2", 0, "a"), ("w2", 1, "c"),
]
W_SCHEMA = "walk_id string, step long, node string"


def test_walk_cooccur_window2(spark):
    out = walk_cooccurrence(spark.createDataFrame(WALKS, W_SCHEMA), window=2)
    got = {(r.node_a, r.node_b): r.n_cooccur for r in out.collect()}
    # w1 pairs within 2 steps: ab, ac, bc, bd, cd; w2 adds ac again
    assert got == {
        ("a", "b"): 1, ("a", "c"): 2, ("b", "c"): 1,
        ("b", "d"): 1, ("c", "d"): 1,
    }


def test_walk_cooccur_matches_duckdb(spark):
    sdf = walk_cooccurrence(spark.createDataFrame(WALKS, W_SCHEMA), window=3)
    got = sorted(map(tuple, sdf.collect()))
    vals = ", ".join(f"('{w}',{s},'{n}')" for w, s, n in WALKS)
    sql = walk_cooccurrence_sql(
        f"(SELECT * FROM (VALUES {vals}) AS t(walk_id, step, node))", window=3
    )
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want
