"""Web link graph: extraction, anchor aggregation, in-degree, crawl diff.

Planted invariants from the synthetic template (sources/webpages.py):
every page carries exactly two anchors — the sameAs self-link and a
related link to https://example.org/wiki/Doc_{(doc_id*31+7)%997} — and
every doc_id%10==0 url has a second capture whose extracted text differs
(the '<p>rev 2</p>' marker)."""

from pyspark.sql import functions as F

from rdf2smw_spark.extract import extract_text
from rdf2smw_spark.operators import weblinks as wl
from rdf2smw_spark.sources.webpages import synth_pages


def test_every_capture_has_two_links(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    edges = wl.extract_links(pages)
    per_src = edges.groupBy("src_url").agg(F.count("*").alias("n")).toPandas()
    # each url appears once per capture; both captures carry 2 anchors
    n_captures = pages.groupBy("url").count().toPandas().set_index("url")["count"]
    assert set(per_src["n"]) == {2 * int(n) for n in n_captures.unique()}


def test_related_target_formula(spark, sf_dir):
    pages = synth_pages(spark, sf_dir).filter(F.col("url").endswith("/doc/0"))
    edges = wl.extract_links(pages).filter(F.col("href").contains("/wiki/"))
    rows = edges.collect()
    assert rows and all(r.href == "https://example.org/wiki/Doc_7" for r in rows)
    assert all(r.anchor == "see also 7" for r in rows)


def test_anchor_stats_aggregates_mentions(spark, sf_dir):
    edges = wl.extract_links(synth_pages(spark, sf_dir))
    stats = wl.anchor_stats(edges)
    wiki = stats.filter(F.col("href").startswith("https://example.org/wiki/"))
    row = wiki.filter(F.col("href") == "https://example.org/wiki/Doc_7").collect()[0]
    # doc 0 links here (twice: two captures), possibly other doc_ids too
    assert row.n_links >= 2 and row.n_sources >= 1
    assert "see also 7" in row.anchors


def test_indegree_topk_is_ranked_and_bounded(spark, sf_dir):
    edges = wl.extract_links(synth_pages(spark, sf_dir))
    top = wl.indegree_topk(edges, k=10).toPandas()
    assert list(top["rank"]) == list(range(1, len(top) + 1))
    assert len(top) <= 10
    assert (top["n_links"].diff().dropna() <= 0).all()


def test_crawl_diff_flags_recrawled_urls(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    diff = wl.crawl_diff(extract_text(pages)).toPandas().set_index("url")
    two = diff[diff["n_captures"] == 2]
    one = diff[diff["n_captures"] == 1]
    assert len(two) > 0 and len(one) > 0
    # every recrawl carries the rev-2 marker -> changed; singles never
    assert two["changed"].all() and (two["n_versions"] == 2).all()
    assert (~one["changed"]).all() and (one["n_versions"] == 1).all()
    # recrawled urls are exactly the doc_id%10==0 ones
    assert all(int(u.rsplit("/", 1)[1]) % 10 == 0 for u in two.index)


def test_anchor_entity_dict_priors(spark):
    from rdf2smw_spark.operators.weblinks import anchor_entity_dict

    edges = spark.createDataFrame(
        [
            ("s1", "http://e/Paris", "Paris"),
            ("s2", "http://e/Paris", "Paris"),
            ("s3", "http://e/Paris", "paris "),   # normalized surface
            ("s4", "http://e/ParisTX", "Paris"),
            ("s5", "http://e/Other", "other"),
            ("s6", "http://e/X", ""),             # empty anchor dropped
        ],
        "src_url string, href string, anchor string",
    )
    out = {(r["surface"], r["uri"]): r for r in anchor_entity_dict(edges).collect()}
    top = out[("paris", "http://e/Paris")]
    assert top["priority"] == 1 and top["n_links"] == 3 and top["p_prior"] == 0.75
    second = out[("paris", "http://e/ParisTX")]
    assert second["priority"] == 2 and second["p_prior"] == 0.25
    assert ("", "http://e/X") not in out


def test_anchor_dict_prior_denominator_unfiltered(spark):
    from rdf2smw_spark.operators.weblinks import anchor_entity_dict

    edges = spark.createDataFrame(
        [("s", "http://e/A", "m")] * 8
        + [("s", "http://e/B", "m"), ("s", "http://e/C", "m")],
        "src_url string, href string, anchor string",
    )
    out = anchor_entity_dict(edges, min_count=2).collect()
    assert len(out) == 1  # only A survives min_count
    assert out[0]["p_prior"] == 0.8  # 8/10, NOT 8/8
