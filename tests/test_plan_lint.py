"""Plan lint across the whole query registry: no registered query may
plan an UNPARTITIONED window — `Window.orderBy(...)` with no
partitionBy funnels the entire input through one reducer for the sort,
the single worst 100-TB anti-pattern (round-3 verdict #1/#2; both
offenders were rewritten as TakeOrderedAndProject). This test keeps
the whole registry honest as it grows.

Detection reads the optimized plan: a `windowspecdefinition(...)` whose
FIRST argument carries an ASC/DESC marker has an empty partition spec
(partition columns precede the ordering columns and carry no marker).
"""

import re

import pytest

from rdf2smw_spark.queries import QUERIES
from rdf2smw_spark.session import release_scoped_caches

_WSD = re.compile(r"windowspecdefinition\(([^()]*?(?:\([^()]*\)[^()]*?)*)\)")


def _unpartitioned_windows(plan: str) -> list[str]:
    bad = []
    for m in _WSD.finditer(plan):
        first_arg = m.group(1).split(",", 1)[0]
        if " ASC" in first_arg or " DESC" in first_arg:
            bad.append(m.group(0)[:120])
    return bad


# Queries ALLOWED to plan a cross join, each with the reason it is not a
# 100-TB anti-pattern. Anything else that plans `Join Cross` fails the
# lint — a new query must either avoid the cartesian or document it here.
_CROSS_OK = {
    # exact all-pairs scan is the operator's documented ORACLE role — at
    # web scale these run on samples; the banded/bucketed variant is the
    # production path (dedup.py / similarity.py contracts)
    "ann_topk": "exact oracle-role quadratic (contract: sample-only)",
    "dd_embed_cosine": "exact oracle-role quadratic (contract: sample-only)",
    "dd_lsh_quality": "quality report needs the exact side as ground truth",
    "ann_ivf_recall": "quality report needs the exact side as ground truth",
    # cross vs a KB-scale broadcast dim (centroids / codebooks): every
    # row scores against all k centroids by design — BroadcastNestedLoop
    # with a tiny build side, no shuffle
    "ann_topk_ivf": "broadcast KB-scale centroid table",
    "ann_topk_pq": "broadcast KB-scale PQ codebooks",
    "ann_hard_negatives": "broadcast KB-scale centroid table (IVF pool)",
    "ivf_kmeans_assign": "broadcast KB-scale trained centroids",
    # cross vs a ONE-ROW aggregate (corpus totals): scalar broadcast
    "kg_skew_profile": "1-row totals join (mean in-degree)",
    "link_pmi": "1-row totals join (corpus token count)",
    "search_bm25": "1-row totals join (avg doc length)",
    "ta_mixture_weights": "1-row totals join (corpus size)",
    "ta_tfidf_terms": "1-row totals join (corpus N for idf)",
    # SPARQL disjoint OPTIONAL: the branch shares no variables, so the
    # non-empty arm IS a cross join by left-join semantics; the branch
    # is a selective pattern (label-filtered, few rows), never the corpus
    "kg_sparql_optional_disjoint": "disjoint OPTIONAL extends by a selective branch",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_lint(spark, sf_dir, name):
    """One pass over each registered query's plans, three lints:

    1. no UNPARTITIONED window (single-reducer global sort);
    2. no row-at-a-time Python UDF (BatchEvalPython) — Python must enter
       plans only through Arrow (ArrowEvalPython / mapInPandas);
    3. no cross join outside the documented _CROSS_OK whitelist.
    """
    df = QUERIES[name](spark, sf_dir)
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        bad = _unpartitioned_windows(plan)
        assert not bad, f"{name} plans a single-reducer window: {bad}"
        if name not in _CROSS_OK:
            assert "Join Cross" not in plan, (
                f"{name} plans an unlisted cartesian — either remove it or "
                "document why it is safe in _CROSS_OK"
            )
        phys = df._jdf.queryExecution().sparkPlan().toString()
        assert "BatchEvalPython" not in phys, (
            f"{name} plans a row-at-a-time Python UDF — use built-in "
            "functions or an Arrow-batched pandas UDF"
        )
    finally:
        release_scoped_caches()
