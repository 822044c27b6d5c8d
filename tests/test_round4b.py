"""Round-4 additions, second batch: duplicated-substring span stats
(Lee et al. windowed exact-substring dedup evidence), BFS hop distance
from the hub entity, and per-doc TF-IDF top terms."""

from pyspark.sql import Row
from pyspark.sql import functions as F


# --- duplicated-substring spans -----------------------------------------------


def _doc(doc_id, text):
    return Row(doc_id=doc_id, text=text)


def test_substring_spans_planted_duplicate(spark):
    """Two docs share an 8-token run; a third shares nothing. The shared
    windows are flagged in both carriers, coverage merges overlaps, and
    the clean doc reads all-zero."""
    from rdf2smw_spark.operators.dedup import duplicated_span_stats

    shared = "alpha beta gamma delta epsilon zeta eta theta iota"  # 9 tokens
    docs = spark.createDataFrame(
        [
            _doc(1, shared + " one two three"),
            _doc(2, "x y z " + shared),
            _doc(3, "totally different words with no overlap at all kappa"),
        ]
    )
    out = {r["doc_id"]: r.asDict() for r in duplicated_span_stats(docs, k=8).collect()}
    # 9 shared tokens -> 2 duplicated 8-windows per carrier, covering all 9
    assert out[1]["n_dup_windows"] == 2
    assert out[2]["n_dup_windows"] == 2
    assert out[1]["covered_tokens"] == 9
    assert out[2]["covered_tokens"] == 9
    assert out[1]["n_tokens"] == 12 and out[1]["n_windows"] == 5
    assert out[3]["n_dup_windows"] == 0 and out[3]["covered_tokens"] == 0


def test_substring_spans_within_doc_repeat_counts(spark):
    """A window repeated WITHIN one doc is duplication evidence too
    (>= 2 corpus occurrences, same as Lee et al.'s suffix-array count)."""
    from rdf2smw_spark.operators.dedup import duplicated_span_stats

    run = "a b c d e f g h"  # exactly 8 tokens
    docs = spark.createDataFrame([_doc(1, run + " filler " + run)])
    out = duplicated_span_stats(docs, k=8).collect()[0]
    assert out["n_dup_windows"] == 2  # the two exact copies of the run
    assert out["covered_tokens"] == 16


def test_substring_spans_short_doc_zero_windows(spark):
    from rdf2smw_spark.operators.dedup import duplicated_span_stats

    docs = spark.createDataFrame([_doc(1, "only three tokens")])
    out = duplicated_span_stats(docs, k=8).collect()[0]
    assert out["n_tokens"] == 3 and out["n_windows"] == 0
    assert out["n_dup_windows"] == 0 and out["covered_tokens"] == 0


# --- BFS hops ------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=s, dst=d) for s, d in pairs])


def test_bfs_hops_hand_graph(spark):
    """Hub = highest-degree node; hops are undirected shortest paths;
    the disconnected island never appears."""
    from rdf2smw_spark.operators.graph import bfs_hops

    # hub h touches a,b,c; chain c-d-e; island x-y
    e = _edges(
        spark,
        [("h", "a"), ("b", "h"), ("h", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
    )
    out = {r["uri"]: r["hops"] for r in bfs_hops(e, max_hops=4).collect()}
    assert out == {"h": 0, "a": 1, "b": 1, "c": 1, "d": 2, "e": 3}


def test_bfs_hops_bound_respected(spark):
    """max_hops truncates: nodes beyond the bound are absent, not
    mislabeled."""
    from rdf2smw_spark.operators.graph import bfs_hops

    chain = [(str(i), str(i + 1)) for i in range(6)]  # 0-1-2-3-4-5-6
    # make node 0 the hub (extra spokes so it wins the degree tiebreak)
    e = _edges(spark, chain + [("0", "s1"), ("0", "s2")])
    out = {r["uri"]: r["hops"] for r in bfs_hops(e, max_hops=2).collect()}
    assert out["2"] == 2 and "3" not in out


# --- TF-IDF top terms ----------------------------------------------------------


def test_tfidf_rare_term_beats_common(spark):
    """A corpus-wide term idf-floors to rank below a doc-unique term even
    at equal tf; ranks are dense 1..k with (score desc, term asc) ties."""
    from rdf2smw_spark.operators.search import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            _doc(1, "common zebra"),
            _doc(2, "common yak"),
            _doc(3, "common common"),
        ]
    )
    out = tfidf_top_terms(docs, per_doc_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    for d in by_doc:
        by_doc[d].sort()
    # at equal tf the doc-unique animals outrank corpus-wide 'common'
    assert by_doc[1] == [(1, "zebra"), (2, "common")]
    assert by_doc[2] == [(1, "yak"), (2, "common")]
    assert by_doc[3] == [(1, "common")]


def test_tfidf_integer_exact_scores(spark):
    """score_e6 is exactly tf * gridded idf — integers end to end."""
    import math

    from pyspark.sql import Row as R

    from rdf2smw_spark.operators.search import tfidf_top_terms

    docs = spark.createDataFrame(
        [R(doc_id=1, text="solo solo solo"), R(doc_id=2, text="other")]
    )
    out = {r["term"]: r for r in tfidf_top_terms(docs, per_doc_k=1).collect()}
    idf_e6 = math.floor((math.log((1 + 2) / (1 + 1)) + 1) * 1e6 + 0.5)
    assert out["solo"]["score_e6"] == 3 * idf_e6
    assert out["other"]["score_e6"] == 1 * idf_e6
