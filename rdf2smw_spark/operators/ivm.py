"""Incremental view maintenance for SPARQL count-aggregate views.

A KG service materializes aggregate views (per-class member counts,
per-predicate usage, per-graph sizes) and must keep them current as
crawl deltas arrive — re-running the aggregate over 10^12 triples per
drain is the anti-pattern. For DELTA-DECOMPOSABLE view shapes the
maintained view is exact:

    V(base ⊎ Δ+)        = merge(V(base), V(Δ+))
    V(base ∖ Δ-)        = merge(V(base), -V(Δ-))

which holds when every solution of the view query depends on exactly
ONE triple (so a delta triple contributes solutions independently of
the base): a single triple pattern, plus any FILTERs (row-local), plus
UNIONs of such groups (bag-additive). Multi-pattern joins are NOT
decomposable this way (a delta triple joins against base triples) and
are rejected loudly rather than maintained wrong.

Scale shape: the merge is one unionByName + one groupBy on the view's
key columns — the shuffle carries |V| + |V(Δ)| slim rows, never the
base triples. Counts that fall to zero drop out of the view (the
group disappears, matching recompute).

The companion check `is_delta_decomposable(query_text)` inspects the
parsed AST, so callers can route non-decomposable views to recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf2smw_spark.sparql import (
    Call,
    Filter_,
    Group,
    SelectItem,
    SelectQuery,
    SparqlSyntaxError,
    TriplePattern,
    Union_,
    Var,
    parse_sparql,
    sparql_select,
)


def _single_source_group(g: Group) -> bool:
    """True when the group has exactly ONE solution-producing element
    (a non-path triple pattern, or a UNION whose branches are all
    single-source) plus row-local filters — i.e. every solution comes
    from one triple."""
    from rdf2smw_spark.sparql import ExistsExpr, Iri

    producers = 0
    for el in g.elements:
        if isinstance(el, TriplePattern):
            if not isinstance(el.p, (Var, Iri)):
                return False  # property path: one solution ≠ one triple
            producers += 1
        elif isinstance(el, Filter_):
            if isinstance(el.expr, ExistsExpr):
                return False  # EXISTS probes the base, not row-local
        elif isinstance(el, Union_):
            if not all(_single_source_group(b) for b in el.branches):
                return False
            producers += 1
        else:
            return False
    return producers <= 1


def _view_query(query_text: str) -> SelectQuery:
    q = parse_sparql(query_text)
    if not isinstance(q, SelectQuery):
        raise SparqlSyntaxError("IVM views must be SELECT queries")
    return q


def is_delta_decomposable(query_text: str) -> bool:
    """True when the view query's solutions each depend on exactly one
    triple: a single (non-path) pattern or a UNION of such, plus
    filters; aggregates must be COUNT (counts add; AVG/MIN/MAX do not
    subtract). GROUP BY keys are unrestricted."""
    q = _view_query(query_text)
    if not _single_source_group(q.where):
        return False
    if q.order_by or q.limit is not None or q.offset is not None or q.distinct:
        return False  # slicing/dedup is not additive
    has_count = False
    for it in q.items:
        if isinstance(it.expr, Var):
            continue  # a GROUP BY key
        if (isinstance(it.expr, Call) and it.expr.fn == "COUNT"
                and not it.expr.distinct):
            has_count = True
            continue  # bare COUNT: counts add
        # anything else — COUNT(DISTINCT) needs the value set, SUM/AVG/
        # MIN/MAX don't subtract, and an aggregate NESTED in arithmetic
        # (e.g. SUM(?x)+0) would be mistaken for a key column by the
        # maintainer — is not count-additive
        return False
    # a view with NO aggregate at all (plain SELECT ?s ?c) is a bag of
    # rows, not a count view: union+groupBy would collapse it to a set
    # and the maintainer would have zero agg expressions — route it to
    # recompute instead of maintaining it wrong
    return has_count


def count_view(triples: DataFrame, query_text: str) -> DataFrame:
    """Materialize the view: just the compiled query (one aggregate)."""
    if not is_delta_decomposable(query_text):
        raise SparqlSyntaxError(
            "view is not delta-decomposable (multi-pattern join, path, "
            "DISTINCT, non-COUNT aggregate, or slice) — recompute instead"
        )
    return sparql_select(triples, query_text)


def maintain_count_view(
    old_view: DataFrame,
    query_text: str,
    delta_plus: DataFrame | None = None,
    delta_minus: DataFrame | None = None,
) -> DataFrame:
    """Merge a materialized count view with added/removed triples.
    `old_view` has the query's projected columns (keys + count
    aliases); deltas are TRIPLE_SCHEMA frames. Exactly equal to
    recomputing the query over the updated base (pytest asserts both
    directions; the registry query hash-checks vs a full-recompute
    oracle)."""
    q = _view_query(query_text)
    count_cols = [
        it.alias for it in q.items
        if isinstance(it.expr, Call) and it.expr.fn == "COUNT"
    ]
    key_cols = [c for c in old_view.columns if c not in count_cols]
    parts = [old_view]
    if delta_plus is not None:
        parts.append(count_view(delta_plus, query_text))
    if delta_minus is not None:
        neg = count_view(delta_minus, query_text)
        parts.append(
            neg.select(
                *key_cols, *[(-F.col(c)).alias(c) for c in count_cols]
            )
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    out = merged.groupBy(*key_cols).agg(
        *[F.sum(c).cast("long").alias(c) for c in count_cols]
    )
    if not key_cols:
        # GLOBAL count view (no GROUP BY): recompute over a drained base
        # yields ONE row with n=0 (SPARQL/Spark global-aggregate
        # semantics), so the zero row must stay — only grouped views
        # drop vanished groups
        return out
    # groups whose every count fell to zero vanish, matching recompute
    keep = None
    for c in count_cols:
        cond = F.col(c) > 0
        keep = cond if keep is None else (keep | cond)
    return out.filter(keep) if keep is not None else out
