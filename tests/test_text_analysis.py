"""Text-analysis operator semantics on planted fixtures (the oracle gate
covers the corpus-scale behavior; these pin edge cases)."""

from rdf2smw_spark.operators import text_analysis as ta


def test_decontaminate_flags_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha bravo charlie delta echo foxtrot golf hotel india")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains all 9 benchmark tokens verbatim -> both its 8-grams hit
            (1, "intro alpha bravo charlie delta echo foxtrot golf hotel india outro"),
            # shares only 7 consecutive tokens -> no 8-gram hit
            (2, "alpha bravo charlie delta echo foxtrot golf zulu yankee xray whiskey"),
            # clean
            (3, "one two three four five six seven eight nine ten"),
            # shorter than 8 tokens: emits no n-grams at all
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ta.decontaminate(train, bench).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["contaminated"] and out[1]["n_hits"] == 2
    assert not out[2]["contaminated"]
    assert not out[3]["contaminated"]
    assert not out[4]["contaminated"] and out[4]["n_hits"] == 0


def test_decontaminate_case_and_punct_insensitive(spark):
    bench = spark.createDataFrame(
        [(0, "Alpha, Bravo; CHARLIE delta echo foxtrot golf hotel!")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(7, "alpha bravo charlie delta echo foxtrot golf hotel")],
        "doc_id long, text string",
    )
    out = ta.decontaminate(train, bench).collect()
    assert out[0]["contaminated"] and out[0]["n_hits"] == 1
