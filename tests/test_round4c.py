"""Round-4 continuation: BGP matching, sorted-neighborhood blocking,
entity PMI, containment dedup, weighted sampling, quality-model inference."""

import math

from pyspark.sql import functions as F

from rdf2smw_spark.operators import dedup as dd
from rdf2smw_spark.operators import linking as lk
from rdf2smw_spark.operators import text_analysis as ta
from rdf2smw_spark.queries import (
    q_kg_bgp_optional,
    q_kg_bgp_path,
    q_kg_bgp_star,
)
from rdf2smw_spark.sources.testdata import load_table


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- BGP ---------------------------------------------------------------------

def test_bgp_star_matches_orders_table(spark, sf_dir):
    res = q_kg_bgp_star(spark, sf_dir).toPandas()
    orders = load_table(spark, sf_dir, "orders").toPandas()
    expected = orders[orders["o_totalprice"].round(2) > 150000]
    assert len(res) == len(expected)
    assert (res["price"].astype(float) > 150000).all()
    # every row joins the right customer
    m = dict(zip(orders["o_orderkey"].astype(str), orders["o_custkey"].astype(str)))
    for r in res.itertuples():
        ok = r.ord_uri.rsplit("/", 1)[1]
        assert r.cust_uri.rsplit("/", 1)[1] == m[ok]


def test_bgp_path_reaches_region_labels(spark, sf_dir):
    res = q_kg_bgp_path(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    # one row per order: the customer type hop fans out to nation+segment,
    # but only nations have subClassOf edges
    assert res.count() == orders.count()
    region_names = {
        r.r_name for r in load_table(spark, sf_dir, "region").collect()
    }
    got = {r.region_name for r in res.select("region_name").distinct().collect()}
    assert got <= region_names and got


def test_bgp_optional_left_join_semantics(spark, sf_dir):
    res = q_kg_bgp_optional(spark, sf_dir).toPandas()
    cust = res[res["subj_uri"].str.contains("/customer/")]
    key = cust["subj_uri"].str.rsplit("/", n=1).str[1].astype(int)
    has_label = cust["label"].notna()
    assert (has_label == (key % 3 == 0)).all()
    # the static weird thing has both name and label
    weird = res[res["subj_uri"] == "http://example.org/thing/weird"]
    assert len(weird) == 1 and weird["label"].notna().all()


# --- sorted-neighborhood blocking --------------------------------------------

def test_sorted_neighborhood_finds_exact_and_near(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    d = lk.corpus_entity_dict(docs, k=20)
    mentions = (
        docs.select(F.explode(F.expr(ta._tokens("text"))).alias("mention"))
        .filter(F.length("mention") >= 3)
        .distinct()
    )
    res = lk.link_sorted_neighborhood(mentions, d, w=3, threshold=0.5).toPandas()
    # every dict surface occurs as a corpus token, sorts adjacent to its
    # identical mention, and scores jaccard 1.0
    exact = res[(res["jaccard"] == 1.0) & (res["mention"] == res["surface"])]
    dict_surfaces = {r.surface for r in d.select("surface").collect()}
    assert set(exact["surface"]) == dict_surfaces
    assert (res["jaccard"] <= 1.0).all() and (res["jaccard"] >= 0.5).all()


def test_sorted_neighborhood_parallelism_invariant(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(200)
    d = lk.corpus_entity_dict(docs, k=10)
    mentions = (
        docs.select(F.explode(F.expr(ta._tokens("text"))).alias("mention"))
        .filter(F.length("mention") >= 3)
        .distinct()
    )
    a = lk.link_sorted_neighborhood(mentions, d).toPandas()
    b = lk.link_sorted_neighborhood(mentions.repartition(17), d).toPandas()
    key = ["mention", "surface", "uri", "jaccard"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )


# --- containment -------------------------------------------------------------

def test_containment_dominates_jaccard(spark, sf_dir):
    docs = dd.near_dup_corpus(_docs(spark, sf_dir))
    sh = dd.char_shingles(docs, max_df=100)
    jac = dd.jaccard_pairs(sh, threshold=0.5).toPandas()
    cont = dd.containment_pairs(sh, threshold=0.0).toPandas()
    cmap = {(r.doc_a, r.doc_b): r.containment for r in cont.itertuples()}
    assert len(jac) > 0
    for r in jac.itertuples():
        # C(a in b) = I/|A| >= I/U = J, both directions
        assert cmap[(r.doc_a, r.doc_b)] >= r.jaccard - 1e-9
        assert cmap[(r.doc_b, r.doc_a)] >= r.jaccard - 1e-9


# --- entity co-occurrence PMI ------------------------------------------------

def test_pmi_matches_hand_computation(spark):
    rows = [
        (1, "e:a"), (1, "e:b"),
        (2, "e:a"), (2, "e:b"),
        (3, "e:a"), (3, "e:c"),
        (4, "e:d"),
    ]
    m = spark.createDataFrame(
        [(d, "s", u) for d, u in rows], "doc_id long, surface string, uri string"
    )
    res = {
        (r.uri_a, r.uri_b): (r.n_ab, r.pmi)
        for r in lk.entity_cooccurrence_pmi(m).collect()
    }
    # N=4 docs; n_a=3, n_b=2, n_ab=2 -> pmi = ln(2*4/(3*2))
    n_ab, pmi = res[("e:a", "e:b")]
    assert n_ab == 2 and abs(pmi - round(math.log(8 / 6), 4)) < 1e-9
    n_ac, pmi_ac = res[("e:a", "e:c")]
    assert n_ac == 1 and abs(pmi_ac - round(math.log(4 / 3), 4)) < 1e-9
    assert ("e:d", "e:a") not in res and ("e:a", "e:d") not in res


# --- weighted sampling -------------------------------------------------------

def test_weighted_sample_shape_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = ta.weighted_sample(docs, k=50).toPandas()
    b = ta.weighted_sample(docs.repartition(19), k=50).toPandas()
    assert list(a["rank"]) == list(range(1, 51))
    assert a[["rank", "doc_id"]].values.tolist() == b[["rank", "doc_id"]].values.tolist()


def test_weighted_sample_biases_toward_long_docs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sample = ta.weighted_sample(docs, k=100).toPandas()
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sample["n_chars"].mean() > corpus_mean


# --- quality model -----------------------------------------------------------

def test_quality_model_decision_boundary(spark, sf_dir):
    res = ta.quality_model(_docs(spark, sf_dir)).toPandas()
    assert ((res["prob"] >= 0) & (res["prob"] <= 1)).all()
    assert (res["keep"] == (res["logit"] >= 0)).all()
    # both classes exist in the corpus (non-vacuous model)
    assert res["keep"].any() and (~res["keep"]).any()


def test_quality_model_prefers_prose_over_noise(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and then it was done"),
            (2, "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) !!! ??? ;;; :::"),
        ],
        "doc_id long, text string",
    )
    res = {r.doc_id: r.prob for r in ta.quality_model(df).collect()}
    assert res[1] > res[2]


# --- label propagation -------------------------------------------------------

def test_lp_communities_two_cliques(spark):
    # two triangles joined by nothing -> two communities
    e = [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z")]
    edges = spark.createDataFrame(e, "src string, dst string")
    from rdf2smw_spark.operators.graph import lp_communities

    res = {r.uri: (r.community, r.community_size) for r in lp_communities(edges).collect()}
    assert {res[n][0] for n in "abc"} == {"a"} and res["a"][1] == 3
    assert {res[n][0] for n in "xyz"} == {"x"} and res["x"][1] == 3


def test_lp_communities_parallelism_invariant(spark, sf_dir):
    from rdf2smw_spark.operators.graph import link_edges, lp_communities
    from rdf2smw_spark.sources.testdata import testdata_triples

    t = testdata_triples(spark, sf_dir)
    a = lp_communities(link_edges(t)).toPandas()
    b = lp_communities(link_edges(t.repartition(23))).toPandas()
    key = ["uri", "community", "community_size"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )


# --- HITS ----------------------------------------------------------------------

def test_hits_bipartite_authority_ordering(spark):
    # h1,h2,h3 all point to t1; only h1 points to t2 -> t1 is the
    # stronger authority; h1 links both targets -> strongest hub
    e = [("h1", "t1"), ("h2", "t1"), ("h3", "t1"), ("h1", "t2")]
    edges = spark.createDataFrame(e, "src string, dst string")
    from rdf2smw_spark.operators.graph import hits

    res = {r.uri: (r.hub_e12, r.auth_e12) for r in hits(edges).collect()}
    assert res["t1"][1] > res["t2"][1] > 0
    assert res["h1"][0] > res["h2"][0]
    assert res["h2"][0] == res["h3"][0]
    # hubs have no authority, targets no hub score
    assert res["h1"][1] == 0 and res["t1"][0] == 0


def test_hits_parallelism_invariant(spark, sf_dir):
    from rdf2smw_spark.operators.graph import hits
    from rdf2smw_spark.operators.weblinks import extract_links
    from rdf2smw_spark.sources.webpages import synth_pages
    from pyspark.sql import functions as F2

    pages = synth_pages(spark, sf_dir)
    edges = extract_links(pages).select(
        F2.col("src_url").alias("src"), F2.col("href").alias("dst")
    )
    a = hits(edges).toPandas().sort_values("uri").reset_index(drop=True)
    b = hits(edges.repartition(29)).toPandas().sort_values("uri").reset_index(drop=True)
    assert a.equals(b)


# --- k-core --------------------------------------------------------------------

def test_kcore_peels_tail(spark):
    # triangle (2-core) with a pendant chain hanging off it
    e = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(e, "src string, dst string")
    from rdf2smw_spark.operators.graph import kcore

    res = {r.uri: r.degree for r in kcore(edges, k=2).collect()}
    assert set(res) == {"a", "b", "c"} and all(d == 2 for d in res.values())


def test_kcore_converges_on_testdata(spark, sf_dir):
    from rdf2smw_spark.operators.graph import kcore, link_edges
    from rdf2smw_spark.sources.testdata import testdata_triples

    t = testdata_triples(spark, sf_dir)
    r6 = kcore(link_edges(t), rounds=6).toPandas()
    r7 = kcore(link_edges(t), rounds=7).toPandas()
    key = ["uri", "degree"]
    assert sorted(map(tuple, r6[key].values.tolist())) == sorted(
        map(tuple, r7[key].values.tolist())
    )


# --- unigram LM score ----------------------------------------------------------

def test_lm_score_prefers_typical_text(spark):
    import math as _m

    rows = [(i, "the cat sat on the mat") for i in range(9)] + [(9, "zyx qwv jkp")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = {r.doc_id: r.avg_logprob for r in ta.unigram_lm_score(df).collect()}
    # common-word docs score far above the all-rare-token doc
    assert res[0] > res[9]
    # hand-check doc 9: each token occurs once, total = 9*6+3 = 57
    assert abs(res[9] - round(round(_m.log(1 / 57) * 1e6) / 1e6 / 1, 4)) < 1e-9


def test_lm_score_parallelism_invariant(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = ta.unigram_lm_score(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        ta.unigram_lm_score(docs.repartition(31))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


# --- incremental novelty -------------------------------------------------------

def test_incremental_novelty_plants(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    batch = dd.incremental_batch(docs)
    res = dd.incremental_novelty(docs, batch, threshold=0.5).toPandas()
    res = res.set_index("doc_id")
    exact_ids = res.index[(res.index >= 2_000_000) & (res.index < 3_000_000)]
    near_ids = res.index[(res.index >= 1_000_000) & (res.index < 2_000_000)]
    novel_ids = res.index[res.index >= 3_000_000]
    assert len(exact_ids) and res.loc[exact_ids, "is_exact_dup"].all()
    assert not res.loc[exact_ids, "novel"].any()
    assert len(near_ids) and res.loc[near_ids, "has_near_dup"].all()
    assert not res.loc[near_ids, "is_exact_dup"].any()
    assert len(novel_ids) and res.loc[novel_ids, "novel"].all()


# --- count-min sketch ----------------------------------------------------------

def test_cms_estimate_upper_bounds_truth(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sketch = ta.cms_build(docs)
    surfaces = lk.corpus_entity_dict(docs).select("surface")
    est = {
        r.surface: r.est for r in ta.cms_estimate(sketch, surfaces).collect()
    }
    toks = docs.select(F.explode(F.expr(ta._tokens("text"))).alias("t"))
    truth = {
        r.t: r.c
        for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()
    }
    assert est
    for s, e in est.items():
        assert e >= truth[s]  # one-sided error, always
    # d*w >> heavy-hitter mass here, so the top surfaces are near-exact
    close = sum(1 for s, e in est.items() if e <= truth[s] * 2)
    assert close >= len(est) * 0.5


def test_cms_sketch_is_mergeable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    full = ta.cms_build(docs).toPandas().set_index(["j", "c"])["cnt"]
    merged = (
        ta.cms_build(half_a)
        .unionByName(ta.cms_build(half_b))
        .groupBy("j", "c")
        .agg(F.sum("cnt").alias("cnt"))
        .toPandas()
        .set_index(["j", "c"])["cnt"]
    )
    assert full.sort_index().equals(merged.sort_index().astype(full.dtype))


# --- rolling window ------------------------------------------------------------

def test_ev_rolling_matches_pandas(spark, sf_dir):
    from rdf2smw_spark.queries import q_ev_rolling

    res = q_ev_rolling(spark, sf_dir).toPandas()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
    )
    ev["cents"] = (ev["value"] * 100.0 + 0.5).apply(int)  # values are positive
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    expect = (
        ev.groupby("user_id")["cents"]
        .rolling(3, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
    )
    ev["rolling"] = expect.astype("int64")
    m = res.set_index("event_id")["rolling_cents_3"]
    assert all(m[r.event_id] == r.rolling for r in ev.itertuples())


def test_bgp_aggregate_having_filters_and_sums_exact(spark, sf_dir):
    from rdf2smw_spark.queries import q_kg_bgp_aggregate

    res = q_kg_bgp_aggregate(spark, sf_dir).toPandas()
    orders = load_table(spark, sf_dir, "orders").toPandas()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    nation = load_table(spark, sf_dir, "nation").toPandas()
    df = orders.merge(
        cust[["c_custkey", "c_nationkey"]],
        left_on="o_custkey", right_on="c_custkey",
    ).merge(nation[["n_nationkey", "n_regionkey"]],
            left_on="c_nationkey", right_on="n_nationkey")
    df["cents"] = (df["o_totalprice"].round(2) * 100).round().astype("int64")
    g = df.groupby(["n_regionkey", "o_orderstatus"]).agg(
        n_orders=("o_orderkey", "size"),
        n_customers=("o_custkey", "nunique"),
        total_cents=("cents", "sum"),
    )
    g = g[g["n_orders"] > g["n_customers"]]
    got = {
        (int(r.region_uri.rsplit("/", 1)[1]), r.status):
            (r.n_orders, r.n_customers, r.total_cents)
        for r in res.itertuples()
    }
    want = {
        (int(k[0]), k[1]): (r.n_orders, r.n_customers, int(r.total_cents))
        for k, r in g.iterrows()
    }
    assert got == want


def test_bgp_aggregate_having_actually_filters(spark):
    """A group where every customer ordered exactly once must be cut by
    HAVING COUNT(*) > COUNT(DISTINCT cust) — proving the clause is
    non-vacuous (the registered sf inputs happen to keep all groups)."""
    from rdf2smw_spark.operators import bgp
    from rdf2smw_spark.queries import _BGP_ONT, _BGP_SUBCLASS, _BGP_TYPE

    rows = []
    # region 0 / status X: cust c1 orders twice -> kept
    # region 1 / status X: two customers order once each -> filtered
    def order(o, c, status, price):
        rows.extend([
            (f"o{o}", _BGP_ONT + "customer", f"c{c}", True, None, "t"),
            (f"o{o}", _BGP_ONT + "orderstatus", status, False, None, "t"),
            (f"o{o}", _BGP_ONT + "totalprice", price, False, None, "t"),
        ])
    order(1, 1, "X", "10.00"); order(2, 1, "X", "5.50")
    order(3, 2, "X", "1.00"); order(4, 3, "X", "2.00")
    rows += [
        ("c1", _BGP_TYPE, "n0", True, None, "t"),
        ("c2", _BGP_TYPE, "n1", True, None, "t"),
        ("c3", _BGP_TYPE, "n1", True, None, "t"),
        ("n0", _BGP_SUBCLASS, "r0", True, None, "t"),
        ("n1", _BGP_SUBCLASS, "r1", True, None, "t"),
    ]
    from rdf2smw_spark.schemas import TRIPLE_SCHEMA
    t = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    star = bgp.bgp_star(
        [
            bgp.triple_pattern(t, _BGP_ONT + "customer", "ord_uri", "cust_uri"),
            bgp.triple_pattern(t, _BGP_ONT + "orderstatus", "ord_uri", "status"),
            bgp.triple_pattern(t, _BGP_ONT + "totalprice", "ord_uri", "price"),
        ],
        "ord_uri",
    )
    from pyspark.sql import functions as F
    ctype = bgp.triple_pattern(t, _BGP_TYPE, "cust_uri", "nation_uri")
    nsub = bgp.triple_pattern(t, _BGP_SUBCLASS, "nation_uri", "region_uri")
    agg = (
        star.join(ctype, "cust_uri").join(F.broadcast(nsub), "nation_uri")
        .groupBy("region_uri", "status")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("cust_uri").alias("n_customers"),
            F.sum((F.col("price").cast("decimal(12,2)") * 100).cast("long")).alias("total_cents"),
        )
    )
    kept = agg.filter(F.col("n_orders") > F.col("n_customers")).collect()
    assert len(kept) == 1
    r = kept[0]
    assert r.region_uri == "r0" and r.n_orders == 2 and r.total_cents == 1550
