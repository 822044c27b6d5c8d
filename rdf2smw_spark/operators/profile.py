"""Key-distribution skew profiler — the diagnostic that feeds the
salting decision.

The north rule demands "partitioning / shuffle / skew handled
explicitly"; this operator is how a pipeline *finds* the skew before it
bites: given any frame and a join/aggregation key, it reports the top-k
heaviest keys with their absolute count, corpus share (ppm) and
multiple-of-the-mean (skew_x_e3, milli-multiples) — exactly the numbers
that justify a salt factor for that key (convert.py's salted subject
shuffle uses N_SUBJ_BUCKETS; this is the measurement that would size it
on real data).

Scale shape: ONE map-side-combined groupBy on the key, a
TakeOrderedAndProject top-k (operators/topk.py — no global window), and
a single-row totals aggregate broadcast onto the k survivors. Nothing
proportional to the distinct-key count ever leaves the executors except
k rows + 1 totals row. All derived ratios are widened-integer
arithmetic (ppm / e3 grid) so the hash matches the DuckDB twin at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf2smw_spark.operators.topk import global_topk_ranked

PROFILE_TOP_K = 20


def key_skew_profile(df: DataFrame, key_col: str, k: int = PROFILE_TOP_K) -> DataFrame:
    """(rank, key, n, share_ppm, skew_x_e3) for the k heaviest values of
    `key_col`. skew_x_e3 = n · n_distinct_keys · 1000 DIV total — 1000
    means "exactly average", 25000 means this key carries 25× the mean
    (salt it ~25 ways before a shuffle on it)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__n_keys")
    )
    top = global_topk_ranked(counts, [("n", "desc"), ("key", "asc")], k)
    return top.crossJoin(F.broadcast(totals)).select(
        "rank",
        "key",
        "n",
        F.expr("CAST(n * 1000000 DIV __total AS BIGINT)").alias("share_ppm"),
        F.expr("CAST(n * __n_keys * 1000 DIV __total AS BIGINT)").alias("skew_x_e3"),
    )


def key_skew_profile_sql(src_sql: str, key_expr: str, k: int = PROFILE_TOP_K) -> str:
    """DuckDB twin: same counts, same grids, ROW_NUMBER stands in for the
    TakeOrderedAndProject (the oracle may sort globally; the Spark plan
    must not)."""
    return f"""
    WITH counts AS (
        SELECT {key_expr} AS key, COUNT(*) AS n FROM {src_sql} GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM counts),
    ranked AS (
        SELECT ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rank, key, n
        FROM counts
    )
    SELECT rank, key, n,
           CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
           CAST(n * n_keys * 1000 // total AS BIGINT) AS skew_x_e3
    FROM ranked, tot
    WHERE rank <= {k}
    """
