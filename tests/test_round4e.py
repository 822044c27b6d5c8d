"""Round-4 continuation: skew profiler, positional phrase search,
entity salience, as-of crawl snapshot."""

from pyspark.sql import functions as F

from rdf2smw_spark.extract import asof_snapshot
from rdf2smw_spark.operators.linking import entity_salience
from rdf2smw_spark.operators.profile import key_skew_profile
from rdf2smw_spark.operators.search import phrase_search


def _docs(rows, spark):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- key_skew_profile ------------------------------------------------------------

def test_skew_profile_planted_hot_key(spark):
    # 90 rows on 'hot', 10 keys with 1 row each -> total 100, n_keys 11
    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "key_in string")
    out = key_skew_profile(df, "key_in", k=3).orderBy("rank").toPandas()
    assert list(out["key"])[0] == "hot"
    assert out["n"].iloc[0] == 90
    assert out["share_ppm"].iloc[0] == 900_000
    # 90 * 11 * 1000 / 100 = 9900 -> this key carries 9.9x the mean
    assert out["skew_x_e3"].iloc[0] == 9900
    # cold keys: 1 * 11 * 1000 / 100 = 110
    assert out["skew_x_e3"].iloc[1] == 110
    # ties broken alphabetically
    assert list(out["key"])[1:] == ["k0", "k1"]


def test_skew_profile_uniform_reads_1000(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(8)] * 4, "k string")
    out = key_skew_profile(df, "k", k=8).toPandas()
    assert (out["skew_x_e3"] == 1000).all()
    assert (out["share_ppm"] == 125_000).all()


# --- phrase_search ---------------------------------------------------------------

def test_phrase_overlapping_matches_counted(spark):
    docs = _docs([(1, "a a a b"), (2, "a b a"), (3, "b b")], spark)
    out = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, ["a", "a"]).collect()
    }
    # "a a a" contains the phrase twice (anchors 0 and 1) — overlap-correct
    assert out == {1: (2, 0)}


def test_phrase_three_terms_and_case_punct(spark):
    docs = _docs(
        [(1, "The quick BROWN fox, quick brown fox!"), (2, "quick fox brown")],
        spark,
    )
    out = phrase_search(docs, ["quick", "brown", "fox"]).collect()
    assert {(r["doc_id"], r["n_matches"], r["first_pos"]) for r in out} == {(1, 2, 1)}


def test_phrase_repeated_term_needs_all_positions(spark):
    # doc 2 has the terms but never consecutively
    docs = _docs([(1, "x y x"), (2, "x x y")], spark)
    out = phrase_search(docs, ["x", "y", "x"]).collect()
    assert {(r["doc_id"], r["n_matches"], r["first_pos"]) for r in out} == {(1, 1, 0)}


# --- entity_salience -------------------------------------------------------------

def test_salience_integer_grid(spark):
    docs = _docs([(1, "ent filler ent filler filler")], spark)
    d = spark.createDataFrame(
        [("ent", "http://example.org/entity/ent", 1)],
        "surface string, uri string, priority long",
    )
    row = entity_salience(docs, d).collect()[0]
    assert row["n_mentions"] == 2 and row["first_pos"] == 1
    # 2*1e6 DIV 5 + 1e6 DIV (9+1) = 400000 + 100000
    assert row["salience_e6"] == 500_000
    assert row["uri"].endswith("/ent")


def test_salience_position_bonus_decays(spark):
    docs = _docs([(1, "ent x x x x x x x x x"), (2, "x x x x x x x x x ent")], spark)
    d = spark.createDataFrame(
        [("ent", "u", 1)], "surface string, uri string, priority long"
    )
    out = {r["doc_id"]: r["salience_e6"] for r in entity_salience(docs, d).collect()}
    assert out[1] > out[2]  # same density, earlier mention scores higher


# --- asof_snapshot ---------------------------------------------------------------

def test_asof_snapshot_picks_newest_at_or_before_cutoff(spark):
    rows = [
        ("u1", "2024-01-01 00:10:00", b"v1"),
        ("u1", "2024-01-01 01:00:00", b"v2-longer"),
        ("u1", "2024-01-01 02:00:00", b"v3"),   # after cutoff: ignored
        ("u2", "2024-01-01 01:30:00", b"w1"),   # exactly at cutoff: included
        ("u3", "2024-01-01 03:00:00", b"x1"),   # first crawled after: absent
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts string, html binary")
    pages = pages.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    out = {r["url"]: r for r in asof_snapshot(pages).collect()}
    assert set(out) == {"u1", "u2"}
    assert out["u1"]["html_len"] == 9 and str(out["u1"]["warc_ts"]).startswith("2024-01-01 01:00")
    assert out["u2"]["html_len"] == 2
