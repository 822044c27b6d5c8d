"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, cross join + JVM fold
  (zip_with/aggregate — no Python in the row path);
- cosine near-dup pairs above a threshold;
- random-hyperplane LSH bucketing: the scale path — candidates share a
  signature bucket, verified exactly. Hyperplanes are deterministic
  (md5-derived), so results are reproducible anywhere.

At 10^12 rows the brute-force variants are quadratic and exist as
correctness oracles; the LSH variant's bucket join is linear in
candidates. All dot products accumulate in double, left-to-right, so
Spark and DuckDB agree bit-for-bit before the defensive ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
NORM = "sqrt(" + DOT.format(a="{v}", b="{v}") + ")"


def _with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("norm", F.expr(NORM.format(v=vec)))


def cosine_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All pairs with cosine similarity >= threshold:
    (id_a, id_b, cosine). Exact quadratic baseline."""
    e = _with_norm(emb.select("vec_id", "embedding"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), F.col("norm").alias("na"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), F.col("norm").alias("nb"))
    dot = F.expr(DOT.format(a="va", b="vb"))
    cos = F.round(dot / (F.col("na") * F.col("nb")), 4)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_pairs_sql(emb_sql: str, threshold: float = 0.95) -> str:
    dot = "list_dot_product(a.embedding, b.embedding)"
    na = "sqrt(list_dot_product(a.embedding, a.embedding))"
    nb = "sqrt(list_dot_product(b.embedding, b.embedding))"
    return f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({dot} / ({na} * {nb}), 4) AS cosine
    FROM {emb_sql} a JOIN {emb_sql} b ON a.vec_id < b.vec_id
    WHERE ROUND({dot} / ({na} * {nb}), 4) >= {threshold}
    """


def ann_topk_bruteforce(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first n_queries vectors:
    (query_id, neighbor_id, cosine, rank). Deterministic tiebreak on
    neighbor_id."""
    from pyspark.sql import Window

    e = _with_norm(emb.select("vec_id", "embedding"))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vq"), F.col("norm").alias("nq")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vc"), F.col("norm").alias("nc"))
    cos = F.round(F.expr(DOT.format(a="vq", b="vc")) / (F.col("nq") * F.col("nc")), 4)
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_topk_sql(emb_sql: str, n_queries: int = 10, k: int = 5) -> str:
    dot = "list_dot_product(q.embedding, c.embedding)"
    nq = "sqrt(list_dot_product(q.embedding, q.embedding))"
    nc = "sqrt(list_dot_product(c.embedding, c.embedding))"
    return f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({dot} / ({nq} * {nc}), 4) AS cosine
        FROM {emb_sql} q JOIN {emb_sql} c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {n_queries}
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


# --- LSH scale path -----------------------------------------------------------

N_PLANES = 6  # 64 buckets — sized so local test corpora keep ~n/64 candidates per bucket


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    import hashlib

    h = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return (h / 2**32) * 2.0 - 1.0


def lsh_bucket_col(dim: int, n_planes: int = N_PLANES) -> F.Column:
    """Signature = concat of sign bits of dot(v, plane_i)."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(_plane_component(p, d)) for d in range(dim)])
        dot = F.expr(
            DOT.format(a="embedding", b=f"array({', '.join(str(_plane_component(p, d)) for d in range(dim))})")
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_topk_lsh(
    emb: DataFrame, n_queries: int = 10, k: int = 5, n_planes: int = N_PLANES
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket
    (multi-probe: exact bucket only — recall traded for a linear join).
    Same output schema as the brute-force variant."""
    from pyspark.sql import Window

    dim = len(emb.select("embedding").first()["embedding"])
    bucketed = _with_norm(emb.select("vec_id", "embedding")).withColumn(
        "bucket", lsh_bucket_col(dim, n_planes)
    )
    q = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vq"),
        F.col("norm").alias("nq"), "bucket",
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vc"),
        F.col("norm").alias("nc"), "bucket",
    )
    cos = F.round(F.expr(DOT.format(a="vq", b="vc")) / (F.col("nq") * F.col("nc")), 4)
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
