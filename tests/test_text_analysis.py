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


def test_repetition_score_planted(spark):
    """Planted repetition: duplicated lines, a dominating bigram, and a
    clean document — exact fractions."""
    from rdf2smw_spark.operators.text_analysis import repetition_score

    rows = [
        # 4 non-empty lines, 'same line' twice -> dup_line_frac 2/4... wait: 4 lines, 3 distinct -> (4-3)/4 = 0.25
        (1, "same line\nsame line\nother line\nthird line"),
        # 'buy now' bigram dominates: tokens = buy now buy now buy now -> bigrams: 5, 'buy now' x3, 'now buy' x2
        (2, "buy now buy now buy now"),
        (3, "a perfectly clean sentence with distinct words only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in repetition_score(docs).collect()}
    assert got[1]["n_lines"] == 4 and abs(got[1]["dup_line_frac"] - 0.25) < 1e-9
    assert abs(got[2]["top_bigram_frac"] - 0.6) < 1e-9  # 3 of 5 bigrams
    assert abs(got[2]["dup_token_frac"] - round(4 / 6, 4)) < 1e-9  # 6 tokens, 2 distinct
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["dup_token_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == round(1 / 7, 4)


def test_corpus_stats_and_top_ngrams_planted(spark):
    from rdf2smw_spark.operators.text_analysis import corpus_stats, top_ngrams

    rows = [
        (1, "alpha beta alpha beta gamma", "en"),
        (2, "alpha beta delta", "en"),
        (3, "un deux trois", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    cs = {r["lang"]: r for r in corpus_stats(docs).collect()}
    assert cs["en"]["n_docs"] == 2 and cs["en"]["total_tokens"] == 8
    assert cs["en"]["mean_tokens_x100"] == 400  # exact integer mean
    assert cs["fr"]["max_tokens"] == cs["fr"]["min_tokens"] == 3
    tg = top_ngrams(docs, n=2, k=3).collect()
    assert tg[0]["ngram"] == "alpha beta" and tg[0]["n_occurrences"] == 3
    assert tg[0]["n_docs"] == 2 and tg[0]["rank"] == 1


def test_stratified_sample_deterministic(spark):
    from rdf2smw_spark.operators.text_analysis import stratified_sample

    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    a = sorted(map(tuple, stratified_sample(docs, per_lang=5).collect()))
    b = sorted(map(tuple, stratified_sample(docs.repartition(7), per_lang=5).collect()))
    assert a == b  # same sample at any partitioning
    from collections import Counter
    per = Counter(lang for _, lang in a)
    assert per == {"en": 5, "de": 5, "fr": 5}


def test_paragraph_dedup_keeps_canonical_once(spark):
    from rdf2smw_spark.operators.text_analysis import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "BOILER\n\nalpha beta\n\nBOILER"),
            (2, "BOILER\n\ngamma delta"),
            (3, "unique text only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    # BOILER occurs 3x across the corpus: exactly ONE survives
    total_boilers = sum(r["text"].count("BOILER") for r in out.values())
    assert total_boilers == 1
    # content paragraphs survive in original order
    assert "alpha beta" in out[1]["text"]
    assert "gamma delta" in out[2]["text"]
    assert out[3]["text"] == "unique text only"
    assert out[3]["n_kept"] == 1 and out[3]["n_dropped"] == 0
    assert sum(r["n_dropped"] for r in out.values()) == 2


def test_paragraph_dedup_keeps_empty_docs(spark):
    from rdf2smw_spark.operators.text_analysis import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "real text"), (2, None), (3, "\n\n \n\n")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["text"] == "" and out[2]["n_kept"] == 0
    assert out[3]["text"] == "" and out[3]["n_dropped"] == 0


def test_dsir_weights_shift_toward_target(spark):
    # target docs speak "wiki" vocabulary; raw web docs speak "spam"
    # vocabulary; one mixed doc sits between. A doc written in target
    # vocabulary must out-weigh a doc written in raw-only vocabulary.
    rows = [
        (1, "encyclopedia article history science", "src0"),   # target
        (2, "encyclopedia science reference archive", "src1"), # target
        (3, "buy cheap pills casino bonus", "src9"),
        (4, "casino bonus buy cheap pills", "src8"),
        (5, "encyclopedia science casino pills", "src7"),      # mixed
        (6, "encyclopedia article science reference", "src6"), # target-like
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in ta.dsir_weights(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # target-vocabulary doc (not itself in the target set) beats spam
    assert out[6]["log_weight"] > out[3]["log_weight"]
    assert out[6]["log_weight"] > out[4]["log_weight"]
    # the mixed doc lands strictly between
    assert out[3]["log_weight"] < out[5]["log_weight"] < out[6]["log_weight"]
    assert out[1]["n_tokens"] == 4


def test_dsir_weights_deterministic_across_parallelism(spark):
    rows = [(i, f"token{i % 7} token{i % 3} filler word", f"src{i % 12}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted(map(tuple, ta.dsir_weights(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, ta.dsir_weights(docs.repartition(16)).collect()))
    assert a == b
