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


# --- Z-order layout ---------------------------------------------------------------

Z_BITS = 16          # bits taken from each key's hash
Z_FILES = 64         # target file/bucket count for the layout


def _bits16(expr: str) -> str:
    """Portable uint16 from an md5: the low 16 bits of the _hex32 word
    (same dual-dialect arithmetic discipline as text_analysis._hex32)."""
    from rdf2smw_spark.operators.text_analysis import _hex32

    return f"({_hex32(expr, 'spark')} % 65536)"


def _bits16_sql(expr: str) -> str:
    from rdf2smw_spark.operators.text_analysis import _hex32

    return f"({_hex32(expr, 'duckdb')} % 65536)"


def _interleave(h1: str, h2: str) -> str:
    """z = bits of h1 and h2 interleaved (h1 gets the odd/high lanes) —
    pure widened-integer arithmetic, identical text in both dialects:
    bit_i(h) = (h DIV 2^i) % 2, placed at 2i+1 / 2i."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({h1} DIV {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({h2} DIV {1 << i}) % 2) * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(triples: DataFrame, n_files: int = Z_FILES) -> DataFrame:
    """Z-order (Morton) data layout for the triples table: interleave
    16 hash bits of subj and pred into a 32-bit z-value, then cut the
    z-space into `n_files` equal ranges. Files end up clustered on BOTH
    keys at once, so a point/range predicate on either column prunes
    ~sqrt-proportionally many files from the scan — the multi-dimension
    clustering Delta/Iceberg OPTIMIZE ZORDER performs, expressed as
    plain deterministic column math (no engine extension needed).

    Returns the layout audit: per file (file_id, n_triples, n_subj,
    n_pred, z_min, z_max) — n_subj·n_pred per file is the pruning
    selectivity a reader gets. Scale shape: the z-value is map-side
    whole-stage-codegen arithmetic; the audit is ONE groupBy on
    file_id (n_files groups). The layout write itself would be
    repartitionByRange(n_files, zval) — range, not hash, so file_id
    boundaries match this audit exactly."""
    # hash each key ONCE into a column, then interleave column refs —
    # inlining the md5-parse arithmetic into all 32 lane terms would
    # repeat it 32x in the generated code
    zf = (
        triples.select(
            "subj",
            "pred",
            F.expr(_bits16("md5(subj)")).alias("__h1"),
            F.expr(_bits16("md5(pred)")).alias("__h2"),
        )
        .withColumn("zval", F.expr(_interleave("__h1", "__h2")))
        .withColumn(
            "file_id",
            F.expr(f"CAST(zval DIV {(1 << (2 * Z_BITS)) // n_files} AS BIGINT)"),
        )
    )
    return zf.groupBy("file_id").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("pred").alias("n_pred"),
        F.min("zval").alias("z_min"),
        F.max("zval").alias("z_max"),
    )


def zorder_layout_sql(triples_sql: str, n_files: int = Z_FILES) -> str:
    z = _interleave("h1", "h2").replace(" DIV ", " // ")
    return f"""
    WITH hs AS (
        SELECT subj, pred,
               {_bits16_sql("md5(subj)")} AS h1,
               {_bits16_sql("md5(pred)")} AS h2
        FROM {triples_sql}
    ),
    zf AS (
        SELECT subj, pred, {z} AS zval FROM hs
    )
    SELECT CAST(zval // {(1 << (2 * Z_BITS)) // n_files} AS BIGINT) AS file_id,
           COUNT(*) AS n_triples,
           COUNT(DISTINCT subj) AS n_subj,
           COUNT(DISTINCT pred) AS n_pred,
           MIN(zval) AS z_min,
           MAX(zval) AS z_max
    FROM zf
    GROUP BY 1
    """
