"""Truth-discovery fact fusion (operators/fusion.py) and quotient-graph
summarization (operators/graph.py)."""

import duckdb
from pyspark.sql import functions as F

from rdf2smw_spark.operators.fusion import (
    fact_fusion,
    fact_fusion_sql,
    fuse_incremental,
    fuse_trust,
    fuse_with_trust,
)
from rdf2smw_spark.operators.graph import quotient_summary, quotient_summary_sql

CLAIM_SCHEMA = "subj string, pred string, obj string, source string"

# f1: 2-vs-1 majority; f2: 1-vs-1 tie at iter0 that only source trust
# (earned on f1) can break — proves the iteration changes the answer.
CLAIMS = [
    ("f1", "p", "x", "A"), ("f1", "p", "x", "B"), ("f1", "p", "y", "C"),
    ("f2", "p", "u", "A"), ("f2", "p", "v", "C"),
]


def test_fusion_trust_breaks_tie(spark):
    out = fact_fusion(spark.createDataFrame(CLAIMS, CLAIM_SCHEMA)).toPandas()
    win = {r.subj: r for r in out.itertuples()}
    assert win["f1"].obj == "x" and win["f1"].n_sources == 2
    # zero-iteration fusion (pure vote) ties f2 and falls back to min
    # obj ('u' by luck of naming) — so ALSO assert the confidences: with
    # trust, u strictly exceeds v; without, they are exactly equal.
    assert win["f2"].obj == "u"
    assert win["f2"].n_objects == 2
    vote = fact_fusion(
        spark.createDataFrame(CLAIMS, CLAIM_SCHEMA), iters=0
    ).toPandas()
    v2 = {r.subj: r for r in vote.itertuples()}
    assert v2["f2"].conf_e6 == 1_000_000  # exact tie under pure voting
    assert win["f2"].conf_e6 > 500_000  # trusted source A dominates


def test_fusion_matches_duckdb_twin_at_iters_3(spark):
    # non-default iteration count: the generated SQL must mirror the
    # Spark loop for ANY iters, not just the registered default
    sdf = fact_fusion(spark.createDataFrame(CLAIMS, CLAIM_SCHEMA), iters=3)
    got = {
        (r.subj, r.obj): (r.conf_e6, r.n_sources, r.n_objects)
        for r in sdf.collect()
    }
    vals = ", ".join(f"('{s}','{p}','{o}','{src}')" for s, p, o, src in CLAIMS)
    sql = fact_fusion_sql(
        f"(SELECT * FROM (VALUES {vals}) AS t(subj, pred, obj, source))",
        iters=3,
    )
    want = {
        (r[0], r[2]): (r[3], r[4], r[5])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want


def test_fusion_deterministic_across_partitioning(spark):
    df1 = spark.createDataFrame(CLAIMS, CLAIM_SCHEMA).repartition(1)
    df7 = spark.createDataFrame(CLAIMS, CLAIM_SCHEMA).repartition(7)
    r1 = sorted(map(tuple, fact_fusion(df1).collect()))
    r7 = sorted(map(tuple, fact_fusion(df7).collect()))
    assert r1 == r7


def test_fuse_incremental_equals_full_revote(spark):
    """Exactness contract: maintaining the fused table under a claim
    delta (frozen trust from the BASE corpus) must equal one full
    voting pass over base ∪ delta under the same trust — including a
    delta from a brand-new source (uniform prior) and a delta that
    flips an existing slot's winner."""
    base = spark.createDataFrame(
        CLAIMS + [("f0", "p", "w", "B")], CLAIM_SCHEMA  # f0: never touched
    )
    delta = spark.createDataFrame(
        [
            ("f2", "p", "v", "D"),  # new source, touches existing slot f2
            ("f3", "p", "z", "A"),  # brand-new slot
            ("f1", "p", "y", "D"),  # extra vote on f1's losing object
        ],
        CLAIM_SCHEMA,
    )
    trust = fuse_trust(base)
    fused = fuse_with_trust(base, trust)
    inc = fuse_incremental(fused, base, delta, trust)
    full = fuse_with_trust(base.unionByName(delta), trust)
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect())
    )
    rows = {r.subj: r for r in inc.collect()}
    assert "f0" in rows  # the untouched-passthrough branch carried a row
    assert "f3" in rows and rows["f3"].obj == "z"  # new slot re-voted in


TRIPLES = [
    # two subjects sharing signature a|b, one with signature a
    ("s1", "a", "s3", True, None, "t"),
    ("s1", "b", "lit", False, "http://www.w3.org/2001/XMLSchema#string", "t"),
    ("s2", "a", "s3", True, None, "t"),
    ("s2", "b", "lit", False, "http://www.w3.org/2001/XMLSchema#string", "t"),
    ("s3", "a", "s1", True, None, "t"),
    # IRI object that is NOT a subject: edge dropped from the summary
    ("s1", "a", "nowhere", True, None, "t"),
]
T_SCHEMA = (
    "subj string, pred string, obj string, obj_is_iri boolean, "
    "obj_datatype string, src_url string"
)


def test_quotient_summary_shapes(spark):
    out = quotient_summary(spark.createDataFrame(TRIPLES, T_SCHEMA)).toPandas()
    rows = {
        (r.src_sig, r.pred, r.dst_sig): (r.n_edges, r.n_src_nodes, r.n_dst_nodes)
        for r in out.itertuples()
    }
    # s1,s2 (sig a|b) -> s3 (sig a) via pred a: 2 edges, 2 src nodes, 1 dst
    assert rows[("a|b", "a", "a")] == (2, 2, 1)
    # s3 -> s1 via a: 1 edge
    assert rows[("a", "a", "a|b")] == (1, 1, 2)
    assert len(rows) == 2  # dangling-object edge contributes nothing


def test_quotient_summary_matches_duckdb(spark):
    got = sorted(
        map(tuple, quotient_summary(spark.createDataFrame(TRIPLES, T_SCHEMA)).collect())
    )
    vals = ", ".join(
        f"('{s}','{p}','{o}',{str(i).lower()},"
        + (f"'{d}'" if d else "CAST(NULL AS VARCHAR)") + ",'{t}')"
        for s, p, o, i, d, t in TRIPLES
    )
    sql = quotient_summary_sql(
        f"(SELECT * FROM (VALUES {vals}) AS "
        f"t(subj, pred, obj, obj_is_iri, obj_datatype, src_url))"
    )
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want
