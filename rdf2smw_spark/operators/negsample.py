"""Deterministic negative sampling for KG-embedding training data.

TransE-family models train on (positive, corrupted) triple pairs: each
real (subj, pred, obj) is paired with n_neg triples whose object is
replaced by a pseudo-random other entity. At web scale the entity pool
has 10^9 members, so the two classic shortcuts both fail: collecting
the pool to the driver doesn't fit, and `rand()` breaks the determinism
every retry/resume/oracle-compare in this repo depends on.

This implementation is exact and fully distributed:

1. The pool (distinct IRI objects) is ranked 0..n-1 in (md5-hash, obj)
   order by the same two-phase prefix-sum pattern as
   text_analysis.pack_sequences: hash-range buckets (deterministic
   widths, no sampled RangePartitioner), per-bucket counts collected
   (n_buckets rows), exclusive prefix offsets broadcast back, and a
   Window PARTITIONED by bucket for the local rank — never a global
   window.
2. Each positive triple draws its corruption indices as
   hex32(md5(subj|pred|obj|j)) % n_pool — a pure function of the
   triple, so the sample is identical at any parallelism and any
   engine.
3. One shuffle hash join on (idx = rank) materializes the corrupted
   object; draws that collide with the true object are filtered (the
   standard false-negative filter), deterministically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdf2smw_spark.operators.text_analysis import _hex32

N_NEG = 2
_RANK_BUCKETS = 64
_HSPACE = 1 << 32


def ranked_entity_pool(triples: DataFrame, n_buckets: int = _RANK_BUCKETS):
    """(rank, entity) for the distinct IRI objects, ranked by
    (hex32(md5(entity)), entity) — uniform hash order so the range
    buckets are balanced. Returns (pool_df, n_pool)."""
    pool = (
        triples.filter(F.col("obj_is_iri"))
        .select(F.col("obj").alias("entity"))
        .distinct()
        .withColumn("__h", F.expr(_hex32("md5(entity)", "spark")))
        .withColumn("__bucket", F.expr(f"__h DIV {_HSPACE // n_buckets}"))
    )
    from rdf2smw_spark.session import scoped_persist

    pool = scoped_persist(pool)
    counts = sorted(
        pool.groupBy("__bucket").agg(F.count("*").alias("n")).collect(),
        key=lambda r: r["__bucket"],
    )
    acc, offsets = 0, []
    for r in counts:
        offsets.append((r["__bucket"], acc))
        acc += r["n"]
    if acc == 0:
        spark = triples.sparkSession
        return spark.createDataFrame([], "rank long, entity string"), 0
    off_dim = triples.sparkSession.createDataFrame(
        offsets, "__bucket long, __off long"
    )
    w = Window.partitionBy("__bucket").orderBy("__h", "entity")
    ranked = pool.withColumn("__local", F.row_number().over(w) - 1).join(
        F.broadcast(off_dim), "__bucket"
    )
    return (
        ranked.select(
            (F.col("__off") + F.col("__local")).cast("long").alias("rank"),
            "entity",
        ),
        acc,
    )


def negative_samples(triples: DataFrame, n_neg: int = N_NEG) -> DataFrame:
    """(subj, pred, obj, j, neg_obj): n_neg corrupted objects per
    IRI-object triple, minus exact false negatives (neg_obj = obj)."""
    pool, n_pool = ranked_entity_pool(triples)
    if n_pool == 0:
        return triples.sparkSession.createDataFrame(
            [], "subj string, pred string, obj string, j long, neg_obj string"
        )
    pos = triples.filter(F.col("obj_is_iri")).select("subj", "pred", "obj")
    draw = _hex32("md5(concat(subj, '|', pred, '|', obj, '|', j))", "spark")
    drawn = pos.select(
        "subj",
        "pred",
        "obj",
        F.explode(F.expr(f"sequence(0, {n_neg - 1})")).alias("j"),
    ).withColumn("idx", F.expr(f"({draw}) % {n_pool}"))
    joined = drawn.join(pool, drawn.idx == pool.rank)
    return (
        joined.filter(F.col("entity") != F.col("obj"))
        .select("subj", "pred", "obj", F.col("j").cast("long"), F.col("entity").alias("neg_obj"))
    )


def negative_samples_sql(triples_sql: str, n_neg: int = N_NEG) -> str:
    """DuckDB twin: the pool rank is a global ROW_NUMBER (fine on the
    single-node oracle; the Spark plan must not be), same draw hash,
    same false-negative filter."""
    h = _hex32("md5(entity)", "duckdb")
    draw = _hex32("md5(subj || '|' || pred || '|' || obj || '|' || j)", "duckdb")
    return f"""
    WITH pool AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY {h}, entity) - 1 AS BIGINT)
                   AS rank,
               entity
        FROM (SELECT DISTINCT obj AS entity FROM {triples_sql} WHERE obj_is_iri)
    ),
    np AS (SELECT COUNT(*) AS n_pool FROM pool),
    drawn AS (
        SELECT subj, pred, obj, CAST(js.j AS BIGINT) AS j,
               ({draw}) % np.n_pool AS idx
        FROM (SELECT subj, pred, obj FROM {triples_sql} WHERE obj_is_iri) t
        CROSS JOIN (SELECT unnest(range({n_neg})) AS j) js
        CROSS JOIN np
    )
    SELECT d.subj, d.pred, d.obj, d.j, p.entity AS neg_obj
    FROM drawn d JOIN pool p ON d.idx = p.rank
    WHERE p.entity <> d.obj
    """
