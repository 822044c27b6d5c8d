"""Round-4 additions: as-of join (vs DuckDB's native ASOF JOIN),
triangle counting (degree orientation vs independent lexical-orientation
oracle), and BM25 search (gridded-idf exact-integer scoring)."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# --- as-of join ---------------------------------------------------------------


def test_asof_join_hand_case(spark):
    """Backward inclusive: equal-ts right row matches; later rows don't;
    no-prior-row left rows get NULLs; greatest event_id wins a right tie."""
    from rdf2smw_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            Row(user_id=1, ts=10, event_id=100, value=1.0),  # before any right
            Row(user_id=1, ts=20, event_id=101, value=2.0),  # ts == right ts
            Row(user_id=1, ts=35, event_id=102, value=3.0),  # after ts=30
            Row(user_id=2, ts=50, event_id=103, value=4.0),  # other key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=20, event_id=200, value=7.0),
            Row(user_id=1, ts=20, event_id=201, value=8.0),  # same ts, larger id
            Row(user_id=1, ts=30, event_id=202, value=9.0),
            Row(user_id=2, ts=60, event_id=203, value=5.0),  # after left's ts
        ]
    )
    out = {
        r["event_id"]: (r["ref_ts"], r["ref_payload"])
        for r in asof_join(left, right).collect()
    }
    assert out[100] == (None, None)
    assert out[101] == (20, 8.0)  # inclusive + max event_id tie-break
    assert out[102] == (30, 9.0)
    assert out[103] == (None, None)


def test_asof_join_matches_duckdb_native(spark, sf_dir):
    """Cross-validate the union+window composition against DuckDB's
    native ASOF JOIN on real event data."""
    from rdf2smw_spark.operators.asof import asof_join, asof_join_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    got = {
        r["event_id"]: (r["ref_ts"], r["ref_payload"])
        for r in asof_join(clicks, purchases).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    sql = asof_join_sql(
        "(SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click')",
        "(SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')",
    )
    want = {
        r[2]: (r[4], r[5])
        for r in con.execute(f"SELECT * FROM {sql}").fetchall()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_range_join_matches_duckdb_iejoin(spark, sf_dir):
    """Bucketized composition == DuckDB's native inequality join,
    microsecond-exact (timestamps in testdata carry microseconds)."""
    from rdf2smw_spark.operators.asof import range_join, range_join_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    got = sorted(
        (r["event_id"], r["r_event_id"])
        for r in range_join(clicks, purchases).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    sql = range_join_sql(
        "(SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click')",
        "(SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')",
    )
    want = sorted((r[2], r[5]) for r in con.execute(f"SELECT * FROM {sql}").fetchall())
    assert len(got) == len(want) > 0
    assert got == want


def test_range_join_boundary_semantics(spark):
    """(lo, hi] window: exact lower bound excluded, upper included,
    cross-bucket matches found."""
    from rdf2smw_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [Row(user_id=1, ts=10_000, event_id=1, value=0.0)]
    ).select(
        "user_id", F.timestamp_seconds("ts").alias("ts"), "event_id", "value"
    )
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=8_200, event_id=10, value=0.0),  # == lo: excluded
            Row(user_id=1, ts=8_201, event_id=11, value=0.0),  # just inside
            Row(user_id=1, ts=9_999, event_id=12, value=0.0),  # prior bucket edge
            Row(user_id=1, ts=10_000, event_id=13, value=0.0),  # == hi: included
            Row(user_id=1, ts=10_001, event_id=14, value=0.0),  # after: excluded
        ]
    ).select("user_id", F.timestamp_seconds("ts").alias("ts"), "event_id", "value")
    got = sorted(
        r["r_event_id"] for r in range_join(left, right, window_sec=1800).collect()
    )
    assert got == [11, 12, 13]


# --- triangle counting --------------------------------------------------------


def test_triangle_counts_hand_graph(spark):
    """K4 minus one edge = 2 triangles; shared edge nodes count twice."""
    from rdf2smw_spark.operators.graph import triangle_counts

    #  a-b, a-c, a-d, b-c, b-d  (no c-d): triangles abc, abd
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("b", "a")],  # reverse duplicate must not double-count
        ["src", "dst"],
    )
    got = {r["uri"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_triangle_counts_partitioning_invariant(spark, sf_dir):
    """Same counts at 2 and 16 partitions (integer-exact, orientation
    total order)."""
    from rdf2smw_spark.operators.graph import link_edges, triangle_counts
    from rdf2smw_spark.sources.testdata import testdata_triples

    e = link_edges(testdata_triples(spark, sf_dir))
    a = sorted(
        (r["uri"], r["n_triangles"])
        for r in triangle_counts(e.repartition(2)).collect()
    )
    b = sorted(
        (r["uri"], r["n_triangles"])
        for r in triangle_counts(e.repartition(16)).collect()
    )
    assert a == b


# --- BM25 ---------------------------------------------------------------------


def test_bm25_topk_matches_duckdb(spark, sf_dir):
    """Integer-exact score match + identical ranking vs the DuckDB twin."""
    from rdf2smw_spark.operators.search import bm25_topk, bm25_topk_sql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["rank"], r["doc_id"], r["score_e12"])
        for r in bm25_topk(docs).orderBy("rank").collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(bm25_topk_sql("documents")).fetchall()]
    assert len(got) == 20
    assert got == want


def test_bm25_monotone_in_tf(spark):
    """A doc repeating a query term more (same length) scores higher."""
    from rdf2smw_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark pad pad pad"),
            Row(doc_id=2, text="spark pad pad pad pad pad"),
            Row(doc_id=3, text="pad pad pad pad pad pad"),
        ]
    )
    rows = bm25_topk(docs, query=["spark"], k=3).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [1, 2]  # doc 3 never matches
    assert rows[0]["score_e12"] > rows[1]["score_e12"] > 0
