"""Crawl-frontier prioritization (weblinks.crawl_frontier) and 2-hop
meta-path counts (schema_discovery.metapath_counts)."""

import duckdb

from rdf2smw_spark.operators.schema_discovery import (
    metapath_counts,
    metapath_counts_sql,
)
from rdf2smw_spark.operators.weblinks import crawl_frontier


def test_frontier_ranks_uncrawled_per_host(spark):
    pages = spark.createDataFrame(
        [("http://a.com/0",), ("http://b.com/0",)], "url string"
    )
    edges = spark.createDataFrame(
        # a.com/1 referenced by 2 sources, a.com/2 by 1; a.com/0 is
        # crawled (excluded); rel has no scheme -> dropped
        [
            ("http://a.com/0", "http://a.com/1", "x"),
            ("http://b.com/0", "http://a.com/1", "x"),
            ("http://b.com/0", "http://a.com/2", "x"),
            ("http://b.com/0", "http://a.com/0", "x"),
            ("http://a.com/0", "relative/path", "x"),
        ],
        "src_url string, href string, anchor string",
    )
    out = crawl_frontier(pages, edges, per_host=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.host, r.url, r.n_refs, r.rank) == ("a.com", "http://a.com/1", 2, 1)


def test_frontier_per_host_budget(spark):
    pages = spark.createDataFrame([("http://z.com/",)], "url string")
    edges = spark.createDataFrame(
        [("http://z.com/", f"http://h.com/{i}", "a") for i in range(5)],
        "src_url string, href string, anchor string",
    )
    out = crawl_frontier(pages, edges, per_host=3).collect()
    assert len(out) == 3
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]


TRIPLES = [
    # s1 -a-> m -b-> t1 ; s2 -a-> m -b-> t2 ; s1 -a-> m2 -c-> t1
    ("s1", "a", "m", True, None, "t"),
    ("s2", "a", "m", True, None, "t"),
    ("m", "b", "t1", True, None, "t"),
    ("m", "b", "t2", True, None, "t"),
    ("s1", "a", "m2", True, None, "t"),
    ("m2", "c", "t1", True, None, "t"),
    # literal edge: never a path component
    ("m", "b", "lit", False, "http://www.w3.org/2001/XMLSchema#string", "t"),
]
T_SCHEMA = (
    "subj string, pred string, obj string, obj_is_iri boolean, "
    "obj_datatype string, src_url string"
)


def test_metapath_degree_product_identity(spark):
    out = metapath_counts(spark.createDataFrame(TRIPLES, T_SCHEMA)).collect()
    got = {(r.pred_a, r.pred_b): r.n_paths for r in out}
    # (a,b): in_a(m)=2 * out_b(m)=2 -> 4; (a,c): in_a(m2)=1 * out_c(m2)=1
    assert got == {("a", "b"): 4, ("a", "c"): 1}


def test_metapath_matches_naive_oracle(spark):
    got = sorted(
        map(tuple, metapath_counts(spark.createDataFrame(TRIPLES, T_SCHEMA)).collect())
    )
    vals = ", ".join(
        f"('{s}','{p}','{o}',{str(i).lower()})" for s, p, o, i, _, _ in TRIPLES
    )
    sql = metapath_counts_sql(
        f"(SELECT * FROM (VALUES {vals}) AS t(subj, pred, obj, obj_is_iri))"
    )
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want
