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


# --- capture_history -------------------------------------------------------------

def test_capture_history_scd2_intervals(spark):
    rows = [
        ("u1", "2024-01-01 00:00:00", "v1"),
        ("u1", "2024-01-01 01:00:00", "v1"),   # same content: collapses
        ("u1", "2024-01-01 02:00:00", "v2"),   # drift: new version
        ("u2", "2024-01-01 00:30:00", "w"),
    ]
    from rdf2smw_spark.operators.weblinks import capture_history

    pages = spark.createDataFrame(rows, "url string, warc_ts string, text string")
    pages = pages.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    out = capture_history(pages).orderBy("url", "version").collect()
    assert [(r["url"], r["version"]) for r in out] == [("u1", 1), ("u1", 2), ("u2", 1)]
    v1, v2, w = out
    assert str(v1["valid_from"]).startswith("2024-01-01 00:00")
    assert str(v1["valid_to"]).startswith("2024-01-01 02:00")  # next VERSION, not next capture
    assert v2["valid_to"] is None and w["valid_to"] is None    # live versions
    assert v1["fp"] != v2["fp"]


# --- zorder_layout ---------------------------------------------------------------

def test_zorder_interleave_arithmetic(spark):
    """The Morton interleave must place h1 bits on odd lanes and h2 on
    even lanes: z(h1=0b11, h2=0b01) = 0b1011 = 11."""
    from rdf2smw_spark.operators.profile import _interleave

    df = spark.range(1).selectExpr("3 AS h1", "1 AS h2")
    z = df.selectExpr(f"{_interleave('h1', 'h2')} AS z").collect()[0]["z"]
    assert z == 11


def test_zorder_layout_covers_all_rows(spark, sf_dir):
    from rdf2smw_spark.operators.profile import zorder_layout
    from rdf2smw_spark.sources.testdata import testdata_triples

    t = testdata_triples(spark, sf_dir)
    out = zorder_layout(t).toPandas()
    assert out["n_triples"].sum() == t.count()
    # file ranges are disjoint z-slices: every file's span stays in its slice
    width = (1 << 32) // 64
    assert ((out["z_min"] // width) == out["file_id"]).all()
    assert ((out["z_max"] // width) == out["file_id"]).all()


# --- ev_retention -----------------------------------------------------------------

def test_retention_cohorts_and_ratios(spark):
    import datetime as dt

    rows = []
    d0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # users 1,2 start day 0; user 2 returns day 1; user 3 starts day 1
    rows += [(1, d0), (2, d0), (2, d0 + dt.timedelta(days=1)),
             (3, d0 + dt.timedelta(days=1)), (3, d0 + dt.timedelta(days=3))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    import rdf2smw_spark.queries as q
    from pyspark.sql import functions as F

    path = "/tmp/ev_retention_test"
    ev.withColumn("event_id", F.monotonically_increasing_id()).write.mode(
        "overwrite"
    ).parquet(path + "/events.parquet")
    out = {
        (str(r["cohort_day"]), r["offset_days"]): r
        for r in q.q_ev_retention(spark, path).collect()
    }
    day0 = "2024-01-01 00:00:00"
    day1 = "2024-01-02 00:00:00"
    assert out[(day0, 0)]["n_active"] == 2
    assert out[(day0, 0)]["cohort_size"] == 2
    assert out[(day0, 1)]["n_active"] == 1
    assert out[(day0, 1)]["retention_e6"] == 500000
    assert out[(day1, 0)]["cohort_size"] == 1
    assert out[(day1, 2)]["n_active"] == 1
    assert out[(day1, 2)]["retention_e6"] == 1000000
