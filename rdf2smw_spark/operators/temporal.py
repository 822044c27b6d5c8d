"""Temporal fact versioning: collapse a time-stamped claim stream into
validity intervals per (subj, pred) — the triple-level analogue of the
SCD2 capture history in extract.asof_snapshot/capture_history (which
versions whole pages). A temporal KG stores (subj, pred, obj,
valid_from, valid_to) so point-in-time queries (`kg as of T`) are one
range predicate instead of a scan of raw observations.

Classic gaps-and-islands: a new island starts whenever the observed
object differs from the previous observation of the same (subj, pred);
each island becomes one interval row.

Scale shape: the only non-map work is one window partitioned by
(subj, pred) ordered by (ts, obj) — group size is the observation
count of ONE fact slot (bounded by crawl frequency, never corpus-
sized) — and the island groupBy, which shuffles on the same key. No
global window, no self-join; at 10^12 observations this is exactly the
two-exchange shape of sessionization (queries.ev_sessionize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fact_intervals(claims: DataFrame) -> DataFrame:
    """claims (subj, pred, obj, ts) -> (subj, pred, obj, version_no,
    valid_from, valid_to, n_obs): consecutive equal objects collapse
    into one interval; version_no is the 1-based island index per
    (subj, pred). Deterministic: observation order is (ts, obj), so
    same-timestamp conflicts order alphabetically on both engines."""
    w = Window.partitionBy("subj", "pred").orderBy("ts", "obj")
    flagged = claims.select(
        "subj", "pred", "obj", "ts",
        F.when(
            F.lag("obj").over(w).isNull() | (F.lag("obj").over(w) != F.col("obj")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("__chg"),
    )
    islands = flagged.withColumn(
        "version_no",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("subj", "pred", "version_no")
        .agg(
            F.min("obj").alias("obj"),  # constant within an island
            F.min("ts").alias("valid_from"),
            F.max("ts").alias("valid_to"),
            F.count("*").alias("n_obs"),
        )
        .select("subj", "pred", "obj", "version_no",
                "valid_from", "valid_to", "n_obs")
    )


def fact_intervals_sql(claims_sql: str) -> str:
    """DuckDB twin: same (ts, obj) observation order, same island sum.
    claims_sql must be a parenthesized relation with columns
    (subj, pred, obj, ts)."""
    return f"""
    WITH c AS (SELECT * FROM {claims_sql}),
    flagged AS (
        SELECT subj, pred, obj, ts,
               CASE WHEN LAG(obj) OVER w IS NULL
                      OR LAG(obj) OVER w <> obj THEN 1 ELSE 0 END AS chg
        FROM c
        WINDOW w AS (PARTITION BY subj, pred ORDER BY ts, obj)
    ),
    islands AS (
        SELECT subj, pred, obj, ts,
               SUM(chg) OVER (PARTITION BY subj, pred ORDER BY ts, obj
                              ROWS UNBOUNDED PRECEDING) AS version_no
        FROM flagged
    )
    SELECT subj, pred, MIN(obj) AS obj,
           CAST(version_no AS BIGINT) AS version_no,
           MIN(ts) AS valid_from, MAX(ts) AS valid_to,
           COUNT(*) AS n_obs
    FROM islands
    GROUP BY subj, pred, version_no
    """
