"""Distributed BPE merge training (Sennrich et al. 2016) — the
tokenizer-construction step of an LLM data pipeline, run over the
corpus's word-frequency table as pure DataFrame ops.

Algorithm (classic): start from words as character sequences; K times,
count adjacent symbol pairs weighted by word frequency, pick the most
frequent pair (deterministic tiebreak), and merge its occurrences
greedily left-to-right in every word. The learned merge list IS the
tokenizer.

Representation trick (the whole design): a word's symbol sequence is a
SENTINEL STRING — symbols joined and wrapped by ' ' (tokens are
[a-z0-9]+ so the space never collides), e.g. "low" → " l o w ". Then:

  * pair counting = split on ' ' + adjacent pairs (array ops, in-row);
  * the merge step = ONE builtin  replace(seq, ' l o ', ' lo ')  —
    the leading/trailing sentinels force symbol-boundary alignment, and
    both engines' replace() scans left-to-right non-overlapping and
    resumes AFTER each replacement, which is exactly BPE's greedy
    non-overlapping merge (" a a a " merges to " aa a ", never " aa aa ").

That keeps every round dual-dialect: the DuckDB oracle unrolls the same
K rounds CTE-for-CTE (the ivf_train discipline), so the hash compare
cross-validates the distributed loop against the textbook definition.

Scale shape: the vocabulary (one row per distinct word) is the working
set — 10^7-10^8 rows for web corpora, orders of magnitude under the
corpus. Per round: one in-row pair explode + one slim (l, r) count
shuffle + one TakeOrderedAndProject top-1 + a map-side replace; the
loop localCheckpoints the vocab each round (lineage discipline,
VERDICT r3 #6). Nothing touches the documents after the initial
word-count shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf2smw_spark.operators.text_analysis import _tokens

BPE_MERGES = 6  # rounds trained by the registered query


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-wide shuffle."""
    return (
        docs.select(F.explode(F.expr(_tokens("text"))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _init_seq_spark() -> str:
    return (
        "concat(' ', array_join(transform(sequence(1, length(word)),"
        " i -> substring(word, i, 1)), ' '), ' ')"
    )


_PAIRS_SPARK = (
    "transform(sequence(1, size(__syms) - 1),"
    " i -> struct(element_at(__syms, i) AS l, element_at(__syms, i + 1) AS r))"
)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    syms = "filter(split(seq, ' '), s -> s <> '')"
    return (
        vocab.select("freq", F.expr(syms).alias("__syms"))
        .filter(F.expr("size(__syms) >= 2"))
        .select("freq", F.explode(F.expr(_PAIRS_SPARK)).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(docs: DataFrame, k: int = BPE_MERGES) -> DataFrame:
    """(step, left, right, pair_count): the first k BPE merges learned
    from the corpus, step starting at 1. Deterministic: ties broken by
    (left, right) ascending. Stops early (fewer rows) if the vocabulary
    runs out of pairs — the registered corpus always sustains k."""
    spark = docs.sparkSession
    vocab = (
        word_freqs(docs)
        .withColumn("seq", F.expr(_init_seq_spark()))
        .select("freq", "seq")
        .localCheckpoint()
    )
    merges = []
    for step in range(1, k + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merges.append((step, l, r, int(cnt)))
        vocab = vocab.withColumn(
            "seq",
            F.expr(f"replace(seq, ' {l} {r} ', ' {l}{r} ')"),
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "step long, left string, right string, pair_count long"
    )


def bpe_train_sql(docs_sql: str, k: int = BPE_MERGES) -> str:
    """DuckDB twin: the same k rounds unrolled as CTEs. Each round
    depends on the previous round's single best-pair row (CROSS JOIN),
    mirroring the driver-side collect of the Spark loop."""
    toks = f"list_filter({_tokens('text', 'duckdb')}, t -> t <> '')"
    init_seq = (
        "' ' || array_to_string(list_transform(generate_series(1, length(word)),"
        " i -> substring(word, i, 1)), ' ') || ' '"
    )
    ctes = [
        f"""wf AS (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT UNNEST({toks}) AS word FROM {docs_sql}
        ) GROUP BY word
    )""",
        f"v0 AS (SELECT freq, {init_seq} AS seq FROM wf)",
    ]
    unions = []
    for s in range(1, k + 1):
        prev = f"v{s - 1}"
        ctes.append(f"""p{s} AS (
        SELECT syms[i] AS l, syms[i + 1] AS r, freq FROM (
            SELECT freq, syms, UNNEST(generate_series(1, len(syms) - 1)) AS i
            FROM (SELECT freq, list_filter(string_split(seq, ' '), x -> x <> '') AS syms
                  FROM {prev})
            WHERE len(syms) >= 2
        )
    )""")
        ctes.append(f"""b{s} AS (
        SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM p{s} GROUP BY l, r
        ORDER BY cnt DESC, l, r LIMIT 1
    )""")
        ctes.append(f"""v{s} AS (
        SELECT v.freq,
               replace(v.seq, ' ' || b.l || ' ' || b.r || ' ',
                       ' ' || b.l || b.r || ' ') AS seq
        FROM {prev} v CROSS JOIN b{s} b
    )""")
        unions.append(
            f"SELECT {s} AS step, l AS left, r AS right, cnt AS pair_count FROM b{s}"
        )
    body = " UNION ALL ".join(unions)
    return "WITH " + ",\n    ".join(ctes) + f"\n    {body}"
