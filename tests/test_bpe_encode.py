"""BPE encode (operators/bpe.py bpe_encode*): textbook behavior of the
apply half — merges apply in training order, greedily, non-overlapping,
and token concatenation reconstructs every word."""

from pyspark.sql import functions as F

from rdf2smw_spark.operators.bpe import bpe_encode, bpe_encode_subset, bpe_train


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sennrich_corpus_merges_apply_in_order(spark):
    # classic: 'lo' dominates -> merged first, then 'low'
    docs = _docs(spark, [(1, "low low low lower lowest"), (2, "low lowest")])
    merges = bpe_train(docs, k=2).orderBy("step").collect()
    assert (merges[0]["left"], merges[0]["right"]) == ("l", "o")
    assert (merges[1]["left"], merges[1]["right"]) == ("lo", "w")
    enc = bpe_encode(docs, k=2).collect()
    by_word = {}
    for r in enc:
        by_word.setdefault((r["doc_id"], r["widx"]), []).append(r)
    for toks in by_word.values():
        toks.sort(key=lambda r: r["sidx"])
        word = "".join(r["token"] for r in toks)
        assert word in {"low", "lower", "lowest"}
        assert toks[0]["token"] == "low"  # both merges applied


def test_greedy_non_overlapping(spark):
    # 'aaa' with merge (a, a): greedy left-to-right -> ['aa', 'a'],
    # never ['a', 'aa'] and never an overlapping double-merge
    docs = _docs(spark, [(1, "aaa aaa aaa aa")])
    enc = bpe_encode(docs, k=1).collect()
    words = {}
    for r in enc:
        words.setdefault(r["widx"], []).append(r)
    for toks in words.values():
        toks.sort(key=lambda r: r["sidx"])
        seq = [r["token"] for r in toks]
        assert seq in (["aa", "a"], ["aa"])


def test_concat_invariant_and_subset_encode(spark):
    train = _docs(
        spark,
        [(i, "shared words repeat shared words repeat unique%d" % i) for i in range(8)],
    )
    subset = train.filter(F.col("doc_id") % 2 == 0)
    enc = bpe_encode_subset(train, subset, k=3)
    rows = enc.collect()
    assert {r["doc_id"] for r in rows} == {0, 2, 4, 6}
    # reconstruct every word from its subword stream
    by_word = {}
    for r in rows:
        by_word.setdefault((r["doc_id"], r["widx"]), []).append(r)
    texts = {r["doc_id"]: r["text"] for r in subset.collect()}
    for (doc_id, widx), toks in by_word.items():
        toks.sort(key=lambda r: r["sidx"])
        word = "".join(r["token"] for r in toks)
        assert word == texts[doc_id].lower().split()[widx]


def test_encode_deterministic_across_partitioning(spark):
    docs = _docs(spark, [(i, "alpha beta gamma alpha beta") for i in range(6)])
    a = bpe_encode(docs, k=2).collect()
    b = bpe_encode(docs.repartition(5), k=2).collect()
    key = lambda r: (r["doc_id"], r["widx"], r["sidx"])
    assert sorted(a, key=key) == sorted(b, key=key)
