"""Dimension tables replacing the reference's whole-dataset ResourceIndex.

The reference materializes every aggregate in one in-memory map
(residxcreator.go:15-24) and probes it three ways (SURVEY.md §1.3). A
naive port would broadcast the entire dataset; instead each probe becomes
a small projected dimension:

- subject_types (T1, determineType: triplestowikipageconv.go:177-195)
- best_titles   (J2, findTitleInTriples: triplestowikipageconv.go:200-208,267-276)
- pred_smw_types (A3/T2: triplestowikipageconv.go:110,120-132)
- class_depth   (J3, countSuperCategories: triplestowikipageconv.go:278-292)

Determinism pins (SURVEY.md §4.3): T1 Predicate-beats-Class precedence;
J2 min-object tiebreak within the same title property; J3 bounded walk
(cycle-safe where the reference recurses forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf2smw_spark.schemas import (
    CATEGORY_TYPES,
    PROPERTY_TYPES,
    SUBCLASS_PROPERTY_URI,
    TITLE_PROPERTIES,
    TYPE_PROPERTY_URI,
    URI_TYPE_CLASS,
    URI_TYPE_PREDICATE,
)


def subject_types(triples: DataFrame) -> DataFrame:
    """T1 → (subj, uri_type) for subjects that are Predicates (2) or
    Classes (3); absent subjects are Undefined (callers coalesce to 1).

    The filter on rdf:type + the two obj lists is pushed into the scan;
    the aggregation input is tiny relative to the triple stream."""
    typed = triples.filter(
        (F.col("pred") == TYPE_PROPERTY_URI)
        & (F.col("obj").isin(PROPERTY_TYPES + CATEGORY_TYPES))
    )
    rank = F.when(F.col("obj").isin(PROPERTY_TYPES), F.lit(URI_TYPE_PREDICATE)).otherwise(
        F.lit(URI_TYPE_CLASS)
    )
    # min() pins Predicate (2) over Class (3) when both are asserted —
    # the reference picks whichever type-triple arrived first (file
    # order); documented divergence within the P/R budget.
    return typed.groupBy("subj").agg(F.min(rank).alias("uri_type"))


def best_titles(triples: DataFrame) -> DataFrame:
    """J2 → (subj, raw_title): first match in the 6-property priority
    list; within one property the reference takes arrival order — we pin
    min(obj). Only subjects carrying a title property appear (small dim:
    one row per *titled* entity, 2 short strings)."""
    prio = F.array_position(
        F.array(*[F.lit(p) for p in TITLE_PROPERTIES]), F.col("pred")
    )
    cand = triples.filter(F.col("pred").isin(TITLE_PROPERTIES)).select(
        "subj", F.col("obj").alias("raw_title"), prio.alias("prio")
    )
    w = Window.partitionBy("subj").orderBy("prio", "raw_title")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("subj", "raw_title")
    )


def subject_types_and_titles(dim_src: DataFrame) -> DataFrame:
    """T1 + J2 fused into ONE subj-keyed aggregation over the
    pred-filtered dim slice -> (subj, uri_type, raw_title), either
    nullable. Replaces two separate shuffles of the same slice (a
    groupBy for types plus a window for titles) with one groupBy that
    partial-aggregates map-side (guide §2.3/§2.4); the window's
    row_number-over-(prio, raw_title) pick is exactly min(struct(prio,
    raw_title)) because struct ordering is lexicographic. Pytested
    equal to subject_types/best_titles."""
    type_rank = F.when(
        (F.col("pred") == TYPE_PROPERTY_URI)
        & F.col("obj").isin(PROPERTY_TYPES + CATEGORY_TYPES),
        F.when(F.col("obj").isin(PROPERTY_TYPES), F.lit(URI_TYPE_PREDICATE))
        .otherwise(F.lit(URI_TYPE_CLASS)),
    )
    prio = F.array_position(
        F.array(*[F.lit(p) for p in TITLE_PROPERTIES]), F.col("pred")
    )
    title_cand = F.when(
        F.col("pred").isin(TITLE_PROPERTIES),
        F.struct(prio.alias("prio"), F.col("obj").alias("raw_title")),
    )
    # Keep ONLY rows that can contribute a type rank or a title: rows
    # that are neither (subclass edges, instance-type edges) would
    # otherwise occupy a (null, null) GROUP per subject — on an
    # instance-heavy corpus that multiplied the aggregation's key
    # domain ~5x and blew the hash-agg memory in the 1-executor scale
    # probe. Subjects filtered out here were emitted as all-null rows
    # before, which every consumer left-joins + coalesces — identical
    # results (pytested).
    relevant = (
        (F.col("pred") == TYPE_PROPERTY_URI)
        & F.col("obj").isin(PROPERTY_TYPES + CATEGORY_TYPES)
    ) | F.col("pred").isin(TITLE_PROPERTIES)
    return (
        dim_src.filter(relevant)
        .groupBy("subj")
        .agg(
            F.min(type_rank).alias("uri_type"),
            F.min(title_cand).alias("__bt"),
        )
        .select("subj", "uri_type", F.col("__bt.raw_title").alias("raw_title"))
    )


def pred_smw_types(triples: DataFrame, smw_type_col) -> DataFrame:
    """A3/T2 → (pred, has_types array, sorted): the SMW 'Has type' values
    observed for each predicate across the whole stream. Distinct-first
    (pred, type) projection keeps the shuffle tiny."""
    obs = (
        triples.select("pred", smw_type_col.alias("smw_type"))
        .where(F.col("smw_type").isNotNull())
        .distinct()
    )
    return obs.groupBy("pred").agg(F.sort_array(F.collect_list("smw_type")).alias("has_types"))


def class_edges(triples: DataFrame) -> DataFrame:
    """The rdf:type / rdfs:subClassOf edge set restricted to the class
    layer: edges whose source is itself used as a category value (object
    of a type/subclass triple). Instance-level type edges (the bulk at
    web scale) are excluded by the semi-join, which is exactly the set
    countSuperCategories can ever walk: every walked node is the object
    of some type/subclass triple."""
    # Resources = IRIs or blank nodes (obj_datatype NULL); the reference
    # walks countSuperCategories through blank-node objects too (it looks
    # up index[obj.String()] without a kind check, triplestowikipageconv.go:285).
    is_resource = F.col("obj_is_iri") | F.col("obj_datatype").isNull()
    edges = triples.filter(
        F.col("pred").isin([TYPE_PROPERTY_URI, SUBCLASS_PROPERTY_URI]) & is_resource
    ).select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    # NO explicit broadcast hint on the semi-join probe: AQE decides from
    # the probe's RUNTIME size. A curated ontology's class-node set is
    # tiny → AQE converts to a broadcast join; adversarial web data
    # (millions of distinct rdf:type objects) stays a shuffle join — and
    # neither case pays a driver-side count. (History: the r2
    # unconditional F.broadcast() hint could OOM executors; the first r3
    # fix counted the probe first, which was safe but cost an extra
    # Spark job on EVERY conversion — ~1.4s of a 10s flagship query.)
    cat_nodes = edges.select(F.col("dst").alias("node")).distinct()
    return edges.join(cat_nodes, edges.src == cat_nodes.node, "left_semi").distinct()


def class_depth_fixpoint(
    spark: SparkSession, edges_df: DataFrame, max_depth: int = 50
) -> DataFrame:
    """J3 as a bounded DataFrame fixpoint — the guard path for dirty
    web-scale graphs whose 'class layer' is adversarially large (every
    URI ever used as an rdf:type object lands in it), where collecting
    to the driver would OOM.

    depth_{k+1}(n) = max over out-edges (n,m) of 1 + depth_k(m), starting
    at 0, iterated to convergence or max_depth. On acyclic graphs this is
    exactly the DFS answer (tested); on cycles the DFS pins revisits to 0
    while the fixpoint saturates cycle members toward max_depth — the
    documented divergence is confined to garbage ontologies, and the cap
    guarantees termination either way. Cost: one edges-sized shuffle per
    level of the hierarchy (real ontologies: <20), with localCheckpoint
    truncating lineage so plans stay constant-size."""
    edges_df = edges_df.persist()
    nodes = (
        edges_df.select(F.col("src").alias("uri"))
        .unionByName(edges_df.select(F.col("dst").alias("uri")))
        .distinct()
        .persist()
    )
    depth = nodes.withColumn("depth", F.lit(0))
    prev_ckpt = None  # last iteration's localCheckpoint, released on replace
    for _ in range(max_depth):
        nd = (
            edges_df.join(
                depth.select(F.col("uri").alias("__dst"), F.col("depth").alias("__dd")),
                edges_df.dst == F.col("__dst"),
                "left",
            )
            .groupBy("src")
            .agg((F.max(F.coalesce(F.col("__dd"), F.lit(0))) + 1).alias("__nd"))
        )
        new_depth = (
            nodes.join(nd, nodes.uri == nd.src, "left")
            .select("uri", F.coalesce(F.col("__nd"), F.lit(0)).alias("depth"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_depth.alias("n")
            .join(depth.alias("o"), "uri")
            .filter(F.col("n.depth") != F.col("o.depth"))
            .take(1)
        )
        # superseded checkpoint: its storage is dead weight once new_depth
        # is materialized (localCheckpoint data is unrecoverable after
        # unpersist, so only ever release the PREVIOUS one)
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = depth if _ > 0 else None
        depth = new_depth
        if not changed:
            break
    edges_df.unpersist()
    nodes.unpersist()
    if prev_ckpt is not None:
        prev_ckpt.unpersist()
    return depth.select("uri", F.col("depth").cast("int").alias("depth"))


# Above this many class-layer edges the driver DFS gives way to the
# distributed fixpoint: 2M edges ≈ a few hundred MB collected — far past
# any curated ontology, well before driver OOM.
CLASS_EDGE_COLLECT_LIMIT = 2_000_000


def class_depth(
    spark: SparkSession,
    triples: DataFrame,
    max_depth: int = 50,
    collect_limit: int = CLASS_EDGE_COLLECT_LIMIT,
) -> DataFrame:
    """J3 → (uri, depth) for every class-layer node.

    depth(n) = 0 if n has no type/subclass out-edges,
               else max over out-edges (n,m) of 1 + depth(m).

    The class layer is tiny relative to instance data (10^4–10^6 nodes
    even against 10^12 documents), so we collect it and run a memoized
    DFS on the driver — exact, one pass, cycle-safe (the reference
    recurses forever on cyclic ontologies; a revisit on the active stack
    contributes 0 and `max_depth` bounds pathological chains). The result
    is a broadcastable (uri, depth) dim.

    Guard (round-1 verdict, zero-cost since round 3): on dirty web data
    the semi-join bound can be adversarially large. The collect itself
    is the guard — `limit(collect_limit + 1).collect()` never pulls more
    than the cap plus one row; seeing the extra row proves the layer is
    oversized and switches to class_depth_fixpoint. No separate count
    job (the earlier count-then-collect shape ran the edge derivation
    twice and cost an extra Spark job per conversion)."""
    # Fast path (r6): collect the RAW type/subclass edge rows with the
    # same limit guard and do the dedup + class-layer semi-join in
    # Python — class_edges' distributed shape (distinct + semi-join)
    # cost two shuffles and an extra cached-slice scan per conversion
    # (~1.5s of kg_fact_rows at sf0.1) just to shrink a frame we were
    # about to collect anyway. When the RAW slice overflows the cap
    # (instance-heavy corpora — the bench's 32x-replicated probe hits
    # this at ~14M type rows) the ORIGINAL distributed class_edges
    # semi-join shrinks it to the class layer first and the guarded
    # collect retries on that; only a class LAYER over the cap falls
    # back to the distributed fixpoint — exactly the round-5 trigger.
    is_resource = F.col("obj_is_iri") | F.col("obj_datatype").isNull()
    raw = triples.filter(
        F.col("pred").isin([TYPE_PROPERTY_URI, SUBCLASS_PROPERTY_URI]) & is_resource
    ).select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    class_layer_collected = False
    if collect_limit is not None:
        # Size check BEFORE the transfer (limit-bounded count, no
        # rows move): an instance-heavy corpus would otherwise ship a
        # collect_limit-sized Arrow blob to the driver only to discard
        # it — a pure constant added to both sides of the scaling pair.
        if raw.limit(collect_limit + 1).count() <= collect_limit:
            edges = raw.toPandas()  # Arrow transfer of a known-small slice
        else:
            edges_df = class_edges(triples)
            edges = edges_df.limit(collect_limit + 1).toPandas()
            if len(edges) > collect_limit:
                return class_depth_fixpoint(spark, edges_df, max_depth)
            class_layer_collected = True
    else:
        edges = raw.toPandas()
    # class layer = edges whose source is itself used as a category
    # value (object of a type/subclass edge) — the python mirror of
    # class_edges' semi-join, byte-equal by construction (a no-op when
    # the distributed semi-join already ran).
    cat_nodes = None if class_layer_collected else set(edges["dst"])
    adj: dict[str, list[str]] = {}
    nodes: set[str] = set()
    seen_pairs: set[tuple[str, str]] = set()
    for src, dst in zip(edges["src"], edges["dst"]):
        if (cat_nodes is not None and src not in cat_nodes) or (src, dst) in seen_pairs:
            continue
        seen_pairs.add((src, dst))
        adj.setdefault(src, []).append(dst)
        nodes.add(src)
        nodes.add(dst)

    memo: dict[str, int] = {}

    def depth(n: str, stack: set[str], d: int) -> int:
        if n in memo:
            return memo[n]
        if n in stack or d > max_depth:
            return 0
        stack.add(n)
        best = 0
        for m in adj.get(n, ()):  # no out-edges -> 0
            best = max(best, 1 + depth(m, stack, d + 1))
        stack.remove(n)
        memo[n] = best
        return best

    rows = [(n, depth(n, set(), 0)) for n in sorted(nodes)]
    from rdf2smw_spark.session import small_local_df

    return small_local_df(spark, rows, "uri string, depth int")
