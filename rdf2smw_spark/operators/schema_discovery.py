"""Schema discovery over the triple stream: property-table
materialization and predicate co-occurrence.

Both are KG-construction steps the reference implies but never
materializes: its predicate index (reference aggregate.go —
TripleAggregator collecting per-subject predicate sets, and the
per-page property index feeding templates) stops at per-subject
grouping. A warehouse-grade engine goes one step further:

- ``property_table``: the classic RDF *property table* layout
  (one row per subject, one column per frequent predicate) that
  turns s-p-o triple scans into columnar scans — the storage layout
  every triple-store paper since SW-Store/Virtuoso recommends for
  star-shaped queries, and exactly what a Spark user wants before
  joining entities against relational sides.
- ``pred_cooccurrence``: which predicates appear together on the
  same subjects — the signal used to cluster predicates into
  candidate classes/templates (the reference hand-derives its
  template page from ALL predicates of a category; co-occurrence is
  the scalable generalization).

Scale shape (100 TB audit):

- ``property_table``: one TakeOrderedAndProject for the top-k
  predicate vocabulary (k rows reach the driver — same bounded
  collect as the IVF coarse quantizer), then ONE groupBy(subj) with
  map-side partial min() aggregation. No join, no window, no skew
  (subjects are near-uniform by construction of the fingerprint
  space).
- ``pred_cooccurrence``: per-subject predicate sets are bounded by
  the *schema* size (tens), not the corpus size, so pairs are
  generated in-row (flatten/transform) from one collect_set — the
  quadratic blow-up of a distinct-pairs self-join on subj never
  materializes. Two shuffles total: the distinct+collect_set and the
  final pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf2smw_spark.operators.topk import global_topk_ranked

PROPERTY_TABLE_K = 6


def top_predicates(triples: DataFrame, k: int = PROPERTY_TABLE_K) -> list[str]:
    """The k most frequent predicates, ties broken lexically — a total
    order, so the vocabulary is identical at any parallelism. k rows
    cross to the driver (TakeOrderedAndProject; never a global sort)."""
    counts = triples.groupBy("pred").agg(F.count("*").alias("n"))
    ranked = global_topk_ranked(counts, [("n", "desc"), ("pred", "asc")], k)
    return [r["pred"] for r in ranked.orderBy("rank").collect()]


def property_table(
    triples: DataFrame, preds: list[str] | None = None, k: int = PROPERTY_TABLE_K
) -> DataFrame:
    """(subj, p1..pk): one row per subject holding the first-wins
    (min) object value of each of the top-k predicates. Positional
    column names keep the schema static across corpora; the
    rank->predicate mapping is `top_predicates` (deterministic).

    min() as the first-wins rule mirrors the reference's fact dedup
    (first value per predicate wins — see operators/aggregate.py),
    made order-independent by taking the lexical minimum."""
    if preds is None:
        preds = top_predicates(triples, k)
    cols = [
        F.min(F.when(F.col("pred") == p, F.col("obj"))).alias(f"p{i + 1}")
        for i, p in enumerate(preds)
    ]
    return (
        triples.filter(F.col("pred").isin(preds))
        .groupBy("subj")
        .agg(*cols)
    )


def property_table_sql(triples_sql: str, k: int = PROPERTY_TABLE_K) -> str:
    """DuckDB twin: same top-k vocabulary via QUALIFY row_number, same
    positional min(CASE WHEN ...) columns via scalar subqueries."""
    cols = ",\n          ".join(
        "min(CASE WHEN pred = (SELECT pred FROM tk WHERE rnk = {r}) "
        "THEN obj END) AS p{r}".format(r=i + 1)
        for i in range(k)
    )
    return f"""(
        WITH triples AS {triples_sql},
        pc AS (SELECT pred, COUNT(*) AS n FROM triples GROUP BY pred),
        tk AS (SELECT pred, ROW_NUMBER() OVER (ORDER BY n DESC, pred) AS rnk
               FROM pc QUALIFY rnk <= {k})
        SELECT subj,
          {cols}
        FROM triples
        WHERE pred IN (SELECT pred FROM tk)
        GROUP BY subj
    )"""


def pred_cooccurrence(triples: DataFrame) -> DataFrame:
    """(p1, p2, n_subjects) with p1 < p2: how many subjects carry both
    predicates. Pairs are generated IN-ROW from each subject's sorted
    distinct predicate set (bounded by schema size), so no self-join
    on subj ever ships data — the plan is distinct -> collect_set ->
    flatten(transform) -> one pair-count shuffle."""
    sets_ = (
        triples.select("subj", "pred")
        .distinct()
        .groupBy("subj")
        .agg(F.array_sort(F.collect_set("pred")).alias("ps"))
    )
    pairs = sets_.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("pr")
    )
    return (
        pairs.select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("n_subjects"))
    )


def pred_cooccurrence_sql(triples_sql: str) -> str:
    """DuckDB twin: the straightforward distinct-pairs self-join — the
    O(n^2)-per-subject formulation the Spark side avoids; agreement
    cross-validates the in-row generator."""
    return f"""(
        WITH triples AS {triples_sql},
        d AS (SELECT DISTINCT subj, pred FROM triples)
        SELECT a.pred AS p1, b.pred AS p2, COUNT(*) AS n_subjects
        FROM d a JOIN d b ON a.subj = b.subj AND a.pred < b.pred
        GROUP BY 1, 2
    )"""


def void_property_partitions(triples: DataFrame) -> DataFrame:
    """VoID property partitions (W3C VoID vocabulary: void:propertyPartition
    with void:triples / void:distinctSubjects / void:distinctObjects) —
    the standard dataset descriptor published alongside an RDF dump so
    consumers can plan queries without scanning it. One groupBy(pred)
    with two distinct-counts; pred cardinality is tiny (vocabularies are
    small even when data is not), so the shuffle is slim at any scale."""
    return (
        triples.groupBy("pred")
        .agg(
            F.count("*").alias("n_triples"),
            F.count_distinct("subj").alias("n_distinct_subjects"),
            F.count_distinct("obj").alias("n_distinct_objects"),
        )
    )


def void_property_partitions_sql(triples_sql: str) -> str:
    return f"""
    SELECT pred,
           COUNT(*) AS n_triples,
           COUNT(DISTINCT subj) AS n_distinct_subjects,
           COUNT(DISTINCT obj) AS n_distinct_objects
    FROM {triples_sql} GROUP BY pred
    """


# --- 2-hop meta-path counts ----------------------------------------------------

def metapath_counts(triples: DataFrame) -> DataFrame:
    """(pred_a, pred_b, n_paths): how many length-2 paths s -p_a-> m
    -p_b-> t the graph contains per predicate pair — the meta-path
    statistics heterogeneous-graph systems (PathSim, metapath2vec) use
    to pick composite relations, and the KG's join-selectivity table.

    Scale shape — the identity that makes this tractable at 10^12
    edges: the path count through middle m is in_{p_a}(m)·out_{p_b}(m),
    so we aggregate per-(node, pred) in/out degrees (two slim shuffles),
    join the two degree frames on the middle node (hash join on uri;
    hub middles are single fat-but-bounded rows, not row explosions),
    and SUM the products — the quadratic path set itself is NEVER
    materialized. The DuckDB twin deliberately computes the naive
    edge-edge self-join instead, so the two engines cross-check the
    identity, not just each other's arithmetic."""
    e = triples.filter(F.col("obj_is_iri")).select("subj", "pred", "obj")
    mid_in = e.groupBy(F.col("obj").alias("m"), F.col("pred").alias("pred_a")).agg(
        F.count("*").alias("c_in")
    )
    mid_out = e.groupBy(F.col("subj").alias("m"), F.col("pred").alias("pred_b")).agg(
        F.count("*").alias("c_out")
    )
    return (
        mid_in.join(mid_out, "m")
        .groupBy("pred_a", "pred_b")
        .agg(F.sum(F.col("c_in") * F.col("c_out")).alias("n_paths"))
    )


def metapath_counts_sql(triples_sql: str) -> str:
    """Oracle via the NAIVE formulation (edge-edge self-join on the
    middle node) — an independent derivation of the same counts."""
    return f"""
    WITH e AS (
        SELECT subj, pred, obj FROM {triples_sql} WHERE obj_is_iri
    )
    SELECT a.pred AS pred_a, b.pred AS pred_b, COUNT(*) AS n_paths
    FROM e a JOIN e b ON a.obj = b.subj
    GROUP BY 1, 2
    """
