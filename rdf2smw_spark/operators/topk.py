"""Global top-k WITHOUT a global sort (round-3 verdict #1/#2 fix).

``Window.orderBy(...)`` with no ``partitionBy`` funnels EVERY row through
one reducer to rank it — invisible at sf0.1, the slowest task in the
plan once the distinct-key space hits 10^8+ (entity-dict vocabulary,
corpus n-grams). ``orderBy(...).limit(k)`` instead compiles to
``TakeOrderedAndProject``: each partition keeps a k-row heap and the
driver merges k·n_partitions rows, so the only globally-ordered
structure that ever exists is k rows.

The rank column is then derived with NO Window at all: the k survivors
collapse into one array (a single-row aggregate), are sorted in-row by
``array_sort`` with an explicit comparator — deterministic regardless of
``collect_list``'s arrival order — and posexplode back out with their
1-based position. The physical plan contains TakeOrderedAndProject + a
k-row hash aggregate; no single-partition Window exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_topk_ranked(
    df: DataFrame,
    order_spec: list[tuple[str, str]],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows of `df` by `order_spec` ([(column, 'asc'|'desc'), ...]),
    with a 1-based `rank_col` prepended. Order columns must be non-null
    (true for every caller: counts and group keys). The full `order_spec`
    must be a total order over rows (callers append a unique tiebreak
    column) or ranks at the boundary would be partitioning-dependent."""
    sort_cols = [
        F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in order_spec
    ]
    topk = df.orderBy(*sort_cols).limit(k)  # TakeOrderedAndProject
    terms = []
    for c, d in order_spec:
        lt, gt = ("1", "-1") if d == "desc" else ("-1", "1")
        terms.append(f"WHEN a.{c} < b.{c} THEN {lt} WHEN a.{c} > b.{c} THEN {gt}")
    cmp = "CASE " + " ".join(terms) + " ELSE 0 END"
    packed = topk.agg(F.collect_list(F.struct(*df.columns)).alias("__xs"))
    return packed.select(
        F.posexplode(F.expr(f"array_sort(__xs, (a, b) -> {cmp})")).alias(
            "__pos", "__row"
        )
    ).select((F.col("__pos") + 1).cast("long").alias(rank_col), "__row.*")
