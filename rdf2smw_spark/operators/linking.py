"""Entity linking (LINK stage, SURVEY.md §7 / north rule): mention →
canonical URI via (1) broadcast-dictionary exact match and (2) MinHash
LSH fuzzy candidates over character 3-grams, verified with exact Jaccard.

The entity dictionary is derived deterministically from the corpus (top-K
tokens by document frequency) so tests need no external data; in
production it would be a curated table — same join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf2smw_spark.operators.dedup import jaccard_pairs, minhash_candidates
from rdf2smw_spark.operators.text_analysis import _tokens

ENTITY_NS = "http://example.org/entity/"
DICT_SIZE = 50


def corpus_entity_dict(docs: DataFrame, k: int = DICT_SIZE) -> DataFrame:
    """(surface, uri, priority): top-k tokens by document frequency,
    ties broken alphabetically — deterministic at any parallelism."""
    from pyspark.sql import Window

    tok = (
        docs.select("doc_id", F.explode(F.expr(_tokens("text"))).alias("surface"))
        .filter(F.length("surface") >= 3)
        .distinct()
    )
    freq = tok.groupBy("surface").agg(F.count("*").alias("df"))
    w = Window.orderBy(F.col("df").desc(), F.col("surface"))
    return (
        freq.withColumn("priority", F.row_number().over(w))
        .filter(F.col("priority") <= k)
        .select(
            "surface",
            F.concat(F.lit(ENTITY_NS), F.col("surface")).alias("uri"),
            "priority",
        )
    )


def corpus_entity_dict_sql(docs_sql: str, k: int = DICT_SIZE) -> str:
    toks = _tokens("text", "duckdb")
    return f"""(
    WITH tok AS (
        SELECT DISTINCT doc_id, surface
        FROM (SELECT doc_id, UNNEST({toks}) AS surface FROM {docs_sql})
        WHERE length(surface) >= 3
    ),
    freq AS (SELECT surface, COUNT(*) AS df FROM tok GROUP BY surface),
    ranked AS (
        SELECT surface, ROW_NUMBER() OVER (ORDER BY df DESC, surface) AS priority
        FROM freq
    )
    SELECT surface, 'http://example.org/entity/' || surface AS uri, priority
    FROM ranked WHERE priority <= {k}
)"""


def link_exact(docs: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Broadcast exact match: (doc_id, surface, uri). One shuffle-free
    map-side join — the dictionary is the broadcast side by design."""
    mentions = (
        docs.select("doc_id", F.explode(F.expr(_tokens("text"))).alias("surface"))
        .filter(F.length("surface") >= 3)
        .distinct()
    )
    return mentions.join(F.broadcast(entity_dict), "surface").select(
        "doc_id", "surface", "uri"
    )


def link_exact_sql(docs_sql: str, dict_sql: str) -> str:
    toks = _tokens("text", "duckdb")
    return f"""
    WITH mentions AS (
        SELECT DISTINCT doc_id, surface
        FROM (SELECT doc_id, UNNEST({toks}) AS surface FROM {docs_sql})
        WHERE length(surface) >= 3
    )
    SELECT m.doc_id, m.surface, d.uri
    FROM mentions m JOIN {dict_sql} d USING (surface)
    """


def link_triples(triples: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """LINK stage (pipeline stage 3): canonicalize literal objects whose
    normalized surface matches the entity dictionary — the fact value
    becomes the canonical URI (an IRI object), so downstream aggregation
    groups mentions of the same entity together.

    Broadcast left join on the normalized surface; unmatched literals
    pass through untouched. Ambiguous surfaces resolve by min priority
    (deterministic)."""
    from pyspark.sql import Window

    best = entity_dict.withColumn(
        "__rn", F.row_number().over(Window.partitionBy("surface").orderBy("priority", "uri"))
    ).filter(F.col("__rn") == 1).select(F.col("surface").alias("__surf"), F.col("uri").alias("__euri"))
    surf = F.trim(F.lower(F.col("obj")))
    joined = triples.join(
        F.broadcast(best), (~F.col("obj_is_iri")) & (surf == F.col("__surf")), "left"
    )
    return joined.select(
        "subj",
        "pred",
        F.coalesce(F.col("__euri"), F.col("obj")).alias("obj"),
        (F.col("obj_is_iri") | F.col("__euri").isNotNull()).alias("obj_is_iri"),
        F.when(F.col("__euri").isNotNull(), F.lit(None).cast("string"))
        .otherwise(F.col("obj_datatype"))
        .alias("obj_datatype"),
        "src_url",
    )


def _char3grams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length({text_col}) - 2, 1)),"
                    f" i -> substring({text_col}, i, 3))"
                )
            ).alias("shingle"),
        )
        .filter(F.length("shingle") == 3)
        .distinct()
    )


def link_fuzzy(
    mention_surfaces: DataFrame, entity_dict: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """MinHash-blocked fuzzy match between mention surfaces and
    dictionary surfaces on char-3-gram Jaccard:
    (mention, surface, uri, jaccard).

    Mentions and dictionary entries share one shingle space; LSH banding
    generates candidates, exact Jaccard verifies. Scales linearly in
    candidate count (no mention x dict cross join)."""
    m = mention_surfaces.select(F.col("mention").alias("m")).distinct()
    d = entity_dict.select("surface", "uri")
    # unified id space: mentions get even ids, dict entries odd
    # (pmod first — ANSI mode rejects the raw xxhash64*2 overflow)
    m_ids = m.withColumn("doc_id", F.pmod(F.xxhash64("m"), F.lit(2**61)) * 2)
    d_ids = d.withColumn("doc_id", F.pmod(F.xxhash64("surface"), F.lit(2**61)) * 2 + 1)
    sh = _char3grams(m_ids, "doc_id", "m").unionByName(
        _char3grams(d_ids, "doc_id", "surface")
    )
    cands = minhash_candidates(sh, k=12, bands=6)
    verified = cands.join(jaccard_pairs(sh, threshold), ["doc_a", "doc_b"])
    # keep only mention-dict pairs (one even, one odd id)
    cross = verified.filter((F.col("doc_a") % 2 == 0) != (F.col("doc_b") % 2 == 0))
    m_side = m_ids.select(F.col("doc_id").alias("mid"), F.col("m").alias("mention"))
    d_side = d_ids.select(F.col("doc_id").alias("did"), "surface", "uri")
    norm = cross.select(
        F.when(F.col("doc_a") % 2 == 0, F.col("doc_a")).otherwise(F.col("doc_b")).alias("mid"),
        # negative odd ids give a % 2 == -1 in Spark, so test != 0
        F.when(F.col("doc_a") % 2 != 0, F.col("doc_a")).otherwise(F.col("doc_b")).alias("did"),
        "jaccard",
    )
    return (
        norm.join(m_side, "mid")
        .join(d_side, "did")
        .select("mention", "surface", "uri", "jaccard")
    )
