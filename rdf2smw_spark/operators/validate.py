"""SHACL-style KG validation: check the triple stream against declared
constraints and report violations — the quality gate a multi-source web
KG runs before publishing (the reference trusts its single curated
input; a crawl-fed KG cannot).

Two constraint families (the two that matter most in practice and
cover the two plan shapes):

* FUNCTIONAL cardinality — a declared-functional predicate admits at
  most one distinct object per subject. One groupBy(subj, pred) over
  the constraint-filtered stream (predicate filter pushed to the scan,
  so the shuffle carries only constrained facts).
* RANGE — the object of a declared predicate must carry an rdf:type
  edge to the declared class. One join of constrained facts against
  the (tiny, broadcast) type dim, then an anti-semantics left join:
  NULL type or wrong type is a violation.

Constraints arrive as a DataFrame (kind, pred, expected), so production
would read them from the ontology; the registered query plants a
deterministic set over the testdata (rdf:type functional — customers
carry nation AND segment types, so violations are real; ont:customer
ranged to one nation class — only that nation's customers pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf2smw_spark.schemas import TYPE_PROPERTY_URI

KIND_FUNCTIONAL = "functional"
KIND_RANGE = "range"


def functional_violations(triples: DataFrame, preds: DataFrame) -> DataFrame:
    """(subj, pred, n_objects) for declared-functional predicates with
    more than one distinct object per subject."""
    constrained = triples.join(F.broadcast(preds.select("pred")), "pred")
    return (
        constrained.groupBy("subj", "pred")
        .agg(F.count_distinct("obj").alias("n_objects"))
        .filter(F.col("n_objects") > 1)
    )


def range_violations(triples: DataFrame, ranges: DataFrame) -> DataFrame:
    """(subj, pred, obj, expected_class) for facts whose IRI object is
    not typed with the declared range class. `ranges` is (pred,
    expected) — the expected rdf:type object for that predicate's
    objects."""
    facts = triples.filter(F.col("obj_is_iri")).join(
        F.broadcast(ranges), "pred"
    )
    typed = triples.filter(F.col("pred") == TYPE_PROPERTY_URI).select(
        F.col("subj").alias("__o"), F.col("obj").alias("__cls")
    )
    ok = (facts["obj"] == typed["__o"]) & (facts["expected"] == typed["__cls"])
    return (
        facts.join(typed, ok, "left")
        .filter(F.col("__cls").isNull())
        .select("subj", "pred", "obj", F.col("expected").alias("expected_class"))
        .distinct()
    )


def shacl_report(
    triples: DataFrame, functional_preds: DataFrame, ranges: DataFrame
) -> DataFrame:
    """(kind, subj, pred, detail): the combined violation report."""
    f = functional_violations(triples, functional_preds).select(
        F.lit(KIND_FUNCTIONAL).alias("kind"),
        "subj",
        "pred",
        F.col("n_objects").cast("string").alias("detail"),
    )
    r = range_violations(triples, ranges).select(
        F.lit(KIND_RANGE).alias("kind"),
        "subj",
        "pred",
        F.concat_ws("|", "obj", "expected_class").alias("detail"),
    )
    return f.unionByName(r)


def shacl_report_sql(
    triples_sql: str, functional_preds: list[str], ranges: list[tuple[str, str]]
) -> str:
    fp = ", ".join(f"'{p}'" for p in functional_preds)
    rng = " UNION ALL ".join(
        f"SELECT '{p}' AS pred, '{c}' AS expected" for p, c in ranges
    )
    return f"""
    WITH t AS (SELECT * FROM {triples_sql}),
    f AS (
        SELECT 'functional' AS kind, subj, pred,
               CAST(COUNT(DISTINCT obj) AS VARCHAR) AS detail
        FROM t WHERE pred IN ({fp})
        GROUP BY subj, pred HAVING COUNT(DISTINCT obj) > 1
    ),
    rng AS ({rng}),
    facts AS (
        SELECT t.subj, t.pred, t.obj, r.expected
        FROM t JOIN rng r USING (pred) WHERE t.obj_is_iri
    ),
    typed AS (SELECT subj AS o, obj AS cls FROM t
              WHERE pred = '{TYPE_PROPERTY_URI}'),
    r AS (
        SELECT DISTINCT 'range' AS kind, f.subj, f.pred,
               f.obj || '|' || f.expected AS detail
        FROM facts f
        LEFT JOIN typed ty ON ty.o = f.obj AND ty.cls = f.expected
        WHERE ty.cls IS NULL
    )
    SELECT * FROM f UNION ALL SELECT * FROM r
    """
