"""Schema discovery: property-table pivot + predicate co-occurrence
(operators/schema_discovery.py)."""


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, False, None, "t://x") for s, p, o in rows],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, src_url string",
    )


def test_property_table_topk_vocab_and_first_wins(spark):
    from rdf2smw_spark.operators.schema_discovery import (
        property_table,
        top_predicates,
    )

    t = _triples(
        spark,
        [
            ("s1", "name", "zed"),
            ("s1", "name", "abe"),  # first-wins = lexical min -> "abe"
            ("s1", "age", "30"),
            ("s2", "name", "bob"),
            ("s2", "rare", "x"),
            ("s3", "name", "cat"),
            ("s3", "age", "40"),
        ],
    )
    # freq: name=4, age=2, rare=1 -> top-2 = [name, age]
    assert top_predicates(t, k=2) == ["name", "age"]
    out = {r["subj"]: r.asDict() for r in property_table(t, k=2).collect()}
    assert out["s1"]["p1"] == "abe" and out["s1"]["p2"] == "30"
    assert out["s2"]["p1"] == "bob" and out["s2"]["p2"] is None
    assert out["s3"]["p1"] == "cat" and out["s3"]["p2"] == "40"


def test_property_table_tie_break_is_lexical(spark):
    from rdf2smw_spark.operators.schema_discovery import top_predicates

    t = _triples(spark, [("s1", "b", "1"), ("s1", "a", "1"), ("s2", "c", "1")])
    # all counts tie (b=1, a=1, c=1) -> lexical order breaks them
    assert top_predicates(t, k=3) == ["a", "b", "c"]


def test_pred_cooccurrence_counts_subjects_once(spark):
    from rdf2smw_spark.operators.schema_discovery import pred_cooccurrence

    t = _triples(
        spark,
        [
            ("s1", "a", "1"),
            ("s1", "a", "2"),  # duplicate (subj, pred) must not double-count
            ("s1", "b", "1"),
            ("s1", "c", "1"),
            ("s2", "a", "1"),
            ("s2", "b", "1"),
            ("s3", "z", "1"),  # lone predicate -> contributes no pair
        ],
    )
    out = {(r["p1"], r["p2"]): r["n_subjects"] for r in pred_cooccurrence(t).collect()}
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_pred_cooccurrence_plan_has_no_join_or_window(spark):
    from rdf2smw_spark.operators.schema_discovery import pred_cooccurrence

    t = _triples(spark, [("s1", "a", "1"), ("s1", "b", "1")])
    plan = pred_cooccurrence(t)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


def test_length_quantiles_pinned_definition(spark):
    """10 docs with 1..10 tokens: ceil-rank definition gives p50=5
    (cum>=5), p90=9, p99=10; a single-doc language reads its own count
    for every percentile."""
    from rdf2smw_spark.operators.text_analysis import length_quantiles

    rows = [("en", " ".join(["w"] * n)) for n in range(1, 11)]
    rows.append(("fr", "a b c"))
    docs = spark.createDataFrame(rows, "lang string, text string")
    out = {r["lang"]: r.asDict() for r in length_quantiles(docs).collect()}
    assert out["en"] == {"lang": "en", "n_docs": 10, "p50": 5, "p90": 9, "p99": 10}
    assert out["fr"] == {"lang": "fr", "n_docs": 1, "p50": 3, "p90": 3, "p99": 3}


def test_mixture_weights_sqrt_upweights_tail(spark):
    """9:1 token split at alpha=0.5 -> 3:1 weights (sqrt), integer-exact:
    s_en = floor(sqrt(9)*1e6) = 3e6, s_fr = 1e6, weights 750000/250000."""
    from rdf2smw_spark.operators.text_analysis import mixture_weights

    docs = spark.createDataFrame(
        [("en", " ".join(["w"] * 9)), ("fr", "w")], "lang string, text string"
    )
    out = {r["lang"]: r.asDict() for r in mixture_weights(docs).collect()}
    assert out["en"] == {"lang": "en", "total_tokens": 9, "weight_e6": 750000}
    assert out["fr"] == {"lang": "fr", "total_tokens": 1, "weight_e6": 250000}


def test_semantic_dedup_collapses_same_list_variants(spark):
    """Every planted +1M variant (cosine ~0.99 to its base) that lands
    in its base's list collapses onto the base id — within-cluster
    recall is 1.0. Cross-list variants are SemDeDup's documented
    recall trade-off (the random corpus puts ~quarter of them there:
    near-uniform centroid scores flip on the noise) and must survive
    as their own keepers. Untouched vectors stay singleton keepers."""
    from rdf2smw_spark.operators.similarity import (
        ivf_assign,
        near_dup_embeddings,
        semantic_dedup,
    )

    emb = near_dup_embeddings(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    )
    lists = {r["vec_id"]: r["list_id"] for r in ivf_assign(emb).collect()}
    by_id = {r["vec_id"]: r for r in semantic_dedup(emb).collect()}
    planted = [v for v in by_id if v >= 1_000_000]
    same = [v for v in planted if lists[v] == lists[v - 1_000_000]]
    cross = [v for v in planted if lists[v] != lists[v - 1_000_000]]
    assert same, "corpus must contain same-list planted variants"
    for v in same:
        assert by_id[v]["cluster_id"] == v - 1_000_000 and not by_id[v]["keep"]
        assert by_id[v - 1_000_000]["keep"]
    for v in cross:  # the method's recall loss, shared by the oracle
        assert by_id[v]["cluster_id"] == v and by_id[v]["keep"]
    lone = next(v for v in by_id if 0 < v < 1_000_000 and v % 5)
    assert by_id[lone]["cluster_id"] == lone and by_id[lone]["keep"]


def test_kmv_sketch_exact_below_k_and_bounded_error_above(spark):
    """A 10-token language (vocab < k) reads the EXACT distinct count;
    a 2000-token language reads a KMV estimate within the ~2/sqrt(k)
    relative-error envelope (asserted at a loose 60% to stay
    flake-free: k=32 -> stderr ~18%)."""
    from rdf2smw_spark.operators.text_analysis import distinct_sketch

    big = " ".join(f"tok{i}" for i in range(2000))
    small = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [("en", big), ("fr", small), ("fr", small)], "lang string, text string"
    )
    out = {r["lang"]: r["est_distinct"] for r in distinct_sketch(docs).collect()}
    assert out["fr"] == 10  # below k: the sketch IS the set
    assert 800 <= out["en"] <= 3200  # estimate, not a count


def test_kmv_sketch_merge_is_salt_invariant(spark):
    """The salted two-phase merge returns the same global k-minima (and
    so the same estimate) at any salt fan-out — associativity evidence."""
    from rdf2smw_spark.operators.text_analysis import distinct_sketch

    docs = spark.createDataFrame(
        [("en", " ".join(f"w{i}" for i in range(500)))], "lang string, text string"
    )
    a = distinct_sketch(docs, n_salts=1).collect()[0]["est_distinct"]
    b = distinct_sketch(docs, n_salts=64).collect()[0]["est_distinct"]
    c = distinct_sketch(docs, n_salts=7).collect()[0]["est_distinct"]
    assert a == b == c


def test_url_canonicalization_rules(spark):
    """Each rule individually and combined: fragment, case, default
    port, trailing slash, query-param order; a non-default port
    survives."""
    from rdf2smw_spark.extract import canonical_urls

    urls = [
        "HTTPS://Example.ORG:443/A/b?z=1&a=2#frag",
        "http://h.com:80/path/",
        "http://h.com:8080/path",
        "https://h.com/p?one=1",
    ]
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {r["url"]: r["canon_url"] for r in canonical_urls(pages).collect()}
    assert out[urls[0]] == "https://example.org/A/b?a=2&z=1"
    assert out[urls[1]] == "http://h.com/path"
    assert out[urls[2]] == "http://h.com:8080/path"
    assert out[urls[3]] == "https://h.com/p?one=1"
