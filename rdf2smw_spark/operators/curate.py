"""End-to-end corpus curation audit: ONE declarative report that
composes the four standard training-data gates — quality filtering,
exact dedup, transitive near-dup dedup, and benchmark decontamination —
into a per-document keep/drop decision with the FIRST applicable drop
reason. This is the table a production data pipeline publishes next to
its output corpus: every dropped document is accountable to exactly one
gate, and the kept set is reproducible from the report alone.

Reason precedence (fixed, documented): exact_dup > near_dup >
contaminated > low_quality. Exact duplicates are also near-duplicates
(identical texts share every MinHash band), so the precedence makes the
cheaper, stronger signal win; contamination outranks quality because a
leaked benchmark document must never be explained away as merely
low-quality.

Scale shape: each input signal keeps its own documented plan (broadcast
benchmark n-grams, banded MinHash candidates, O(log diameter) label
propagation, map-side quality projection); this report adds only four
slim doc_id-keyed joins on top — at 10^12 docs that is four
co-partitioned hash joins on the same key, no new quadratic or global
anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf2smw_spark.operators.dedup import (
    char_shingles,
    dedup_clusters,
    dedup_clusters_sql,
    exact_dedup,
    exact_dedup_sql,
    minhash_near_dups,
    minhash_near_dups_sql,
)
from rdf2smw_spark.operators.text_analysis import (
    decontaminate,
    decontaminate_sql,
    quality_score,
    quality_score_sql,
)

QUALITY_MIN = 0.2
JACCARD_THRESHOLD = 0.5
SHINGLE_MAX_DF = 100


def curate_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    quality_min: float = QUALITY_MIN,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_df: int = SHINGLE_MAX_DF,
) -> DataFrame:
    """(doc_id, kept, drop_reason): the curation decision per document.

    drop_reason is NULL iff kept. The four underlying signals are the
    registry's own hash-verified operators (dd_exact, dd_cluster,
    ta_decontam, ta_quality), so this report is exactly as trustworthy
    as its parts."""
    ex = exact_dedup(corpus).select("doc_id", "canonical_id")
    edges = minhash_near_dups(
        char_shingles(corpus, max_df=max_df), threshold=jaccard_threshold
    )
    cc = dedup_clusters(corpus, edges)
    qs = quality_score(corpus).select("doc_id", "quality")
    dc = decontaminate(corpus, benchmark).select("doc_id", "contaminated")
    j = (
        corpus.select("doc_id")
        .join(ex, "doc_id")
        .join(cc, "doc_id")
        .join(qs, "doc_id")
        .join(dc, "doc_id")
    )
    reason = (
        F.when(F.col("doc_id") != F.col("canonical_id"), F.lit("exact_dup"))
        .when(F.col("doc_id") != F.col("cluster_id"), F.lit("near_dup"))
        .when(F.col("contaminated"), F.lit("contaminated"))
        .when(F.col("quality") < quality_min, F.lit("low_quality"))
    )
    return j.select(
        "doc_id",
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
    )


def curate_report_sql(
    corpus_sql: str,
    shingles_sql: str,
    benchmark_sql: str,
    quality_min: float = QUALITY_MIN,
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> str:
    """DuckDB twin — same four signals from the same oracle generators,
    same precedence CASE. `shingles_sql` is passed pre-built so the
    caller pins the exact shingle derivation (max_df etc.) it uses on
    the Spark side."""
    ex = exact_dedup_sql(corpus_sql)
    cc = dedup_clusters_sql(
        corpus_sql, minhash_near_dups_sql(shingles_sql, threshold=jaccard_threshold)
    )
    qs = quality_score_sql(corpus_sql)
    dc = decontaminate_sql(corpus_sql, benchmark_sql)
    return f"""
    WITH ex AS ({ex}),
    cc AS ({cc}),
    qs AS ({qs}),
    dc AS ({dc}),
    j AS (
        SELECT d.doc_id,
               CASE WHEN d.doc_id <> ex.canonical_id THEN 'exact_dup'
                    WHEN d.doc_id <> cc.cluster_id THEN 'near_dup'
                    WHEN dc.contaminated THEN 'contaminated'
                    WHEN qs.quality < {quality_min} THEN 'low_quality'
               END AS drop_reason
        FROM (SELECT doc_id FROM {corpus_sql}) d
        JOIN ex USING (doc_id)
        JOIN cc USING (doc_id)
        JOIN qs USING (doc_id)
        JOIN dc USING (doc_id)
    )
    SELECT doc_id, drop_reason IS NULL AS kept, drop_reason FROM j
    """
