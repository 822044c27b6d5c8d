"""Entity linking (LINK stage, SURVEY.md §7 / north rule): mention →
canonical URI via (1) broadcast-dictionary exact match and (2) MinHash
LSH fuzzy candidates over character 3-grams, verified with exact Jaccard.

The entity dictionary is derived deterministically from the corpus (top-K
tokens by document frequency) so tests need no external data; in
production it would be a curated table — same join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdf2smw_spark.operators.dedup import jaccard_for_pairs, minhash_candidates
from rdf2smw_spark.operators.text_analysis import _tokens
from rdf2smw_spark.session import scoped_persist

ENTITY_NS = "http://example.org/entity/"
DICT_SIZE = 50


def corpus_entity_dict(docs: DataFrame, k: int = DICT_SIZE) -> DataFrame:
    """(surface, uri, priority): top-k tokens by document frequency,
    ties broken alphabetically — deterministic at any parallelism.

    Scale shape (round-3 verdict #1 fix): the old global
    ``Window.orderBy(df desc, surface)`` ranked EVERY distinct corpus
    token (10^8+ at web scale) through one reducer. Now the top-k runs
    as ``orderBy().limit(k)`` → TakeOrderedAndProject (per-partition
    k-row heaps, driver merge), and priority is derived from an in-row
    array_sort over the k survivors — no Window anywhere in the plan
    (operators/topk.py). Same rows, same priorities, same hash."""
    from rdf2smw_spark.operators.topk import global_topk_ranked

    tok = (
        docs.select("doc_id", F.explode(F.expr(_tokens("text"))).alias("surface"))
        .filter(F.length("surface") >= 3)
        .distinct()
    )
    freq = tok.groupBy("surface").agg(F.count("*").alias("df"))
    ranked = global_topk_ranked(
        freq, [("df", "desc"), ("surface", "asc")], k, rank_col="priority"
    )
    return ranked.select(
        "surface",
        F.concat(F.lit(ENTITY_NS), F.col("surface")).alias("uri"),
        "priority",
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


def _canonicalize_literals(triples: DataFrame, mapping) -> DataFrame:
    """Apply a (__surf, __euri) canonicalization map to the literal
    objects of a triple stream: matched literals become IRI objects,
    everything else passes through. Shared by the exact and fuzzy LINK
    passes so their output projections can never drift."""
    surf = F.trim(F.lower(F.col("obj")))
    joined = triples.join(
        mapping, (~F.col("obj_is_iri")) & (surf == F.col("__surf")), "left"
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
    return _canonicalize_literals(triples, F.broadcast(best))


# Above this many fuzzy-matched distinct surfaces the canonicalization
# map is joined by shuffle instead of broadcast. The map is bounded by
# surfaces that LSH-collide with the (small, curated) dictionary, so in
# practice it is far below this; the guard is for adversarial corpora.
FUZZY_MAP_BROADCAST_LIMIT = 5_000_000


def link_triples_fuzzy(
    triples: DataFrame,
    entity_dict: DataFrame,
    threshold: float = 0.5,
    broadcast_limit: int = FUZZY_MAP_BROADCAST_LIMIT,
) -> DataFrame:
    """LINK stage with the optional fuzzy second pass: exact
    canonicalization first (link_triples), then MinHash-blocked fuzzy
    matching over the literal surfaces the exact pass left unmatched —
    a typo'd mention ("sparc") still resolves to the canonical URI.

    Best candidate per surface = max Jaccard, ties broken by min uri
    (deterministic at any parallelism). The resulting surface→uri map is
    broadcast when small (counted first), shuffle-joined otherwise."""
    from pyspark.sql import Window

    exact = link_triples(triples, entity_dict)
    rem = (
        exact.filter(~F.col("obj_is_iri"))
        .select(F.trim(F.lower(F.col("obj"))).alias("mention"))
        .filter(F.length("mention") >= 3)
        .distinct()
    )
    from rdf2smw_spark.session import maybe_broadcast

    fz = link_fuzzy(rem, entity_dict, threshold)
    w = Window.partitionBy("mention").orderBy(F.col("jaccard").desc(), F.col("uri"))
    best = scoped_persist(
        fz.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("mention").alias("__surf"), F.col("uri").alias("__euri"))
    )
    return _canonicalize_literals(exact, maybe_broadcast(best, broadcast_limit))


def _char3grams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # array_distinct inside the row: doc_id is unique per input row
    # (distinct mentions / dict surfaces), so the exploded frame is
    # globally distinct with no shuffle (same rework as char_shingles)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(
                f"array_distinct(filter("
                f"transform(sequence(1, greatest(length({text_col}) - 2, 1)),"
                f" i -> substring({text_col}, i, 3)),"
                f" s -> length(s) = 3))"
            )
        ).alias("shingle"),
    )


def link_fuzzy(
    mention_surfaces: DataFrame, entity_dict: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """MinHash-blocked fuzzy match between mention surfaces and
    dictionary surfaces on char-3-gram Jaccard:
    (mention, surface, uri, jaccard).

    Mentions and dictionary entries share one shingle space; LSH banding
    generates candidates, exact Jaccard verifies CANDIDATES ONLY
    (jaccard_for_pairs) — verifying via the corpus-wide shingle
    self-join and intersecting afterwards re-introduces the quadratic
    co-occurrence blow-up LSH exists to avoid (the same lesson measured
    in minhash_near_dups: dedup.py). Scales linearly in candidate count
    (no mention x dict cross join)."""
    m = mention_surfaces.select(F.col("mention").alias("m")).distinct()
    d = entity_dict.select("surface", "uri")
    # unified id space: mentions get even ids, dict entries odd
    # (pmod first — ANSI mode rejects the raw xxhash64*2 overflow).
    # The SHINGLE side must be one row per distinct surface: an
    # ambiguous dictionary (same surface, several uris — what the
    # priority column exists for) would otherwise emit every shingle
    # once per uri under ONE doc_id and inflate jaccard past 1.0
    # (regression caught by review after the _char3grams in-row-dedup
    # rework removed the global distinct that masked it).
    m_ids = m.withColumn("doc_id", F.pmod(F.xxhash64("m"), F.lit(2**61)) * 2)
    d_ids = d.withColumn("doc_id", F.pmod(F.xxhash64("surface"), F.lit(2**61)) * 2 + 1)
    d_surf_ids = (
        d.select("surface").distinct()
        .withColumn("doc_id", F.pmod(F.xxhash64("surface"), F.lit(2**61)) * 2 + 1)
    )
    sh = _char3grams(m_ids, "doc_id", "m").unionByName(
        _char3grams(d_surf_ids, "doc_id", "surface")
    )
    sh = scoped_persist(sh)  # feeds the signature agg and both sides of the verify
    cands = minhash_candidates(sh, k=12, bands=6)
    verified = jaccard_for_pairs(sh, cands, threshold)
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


def link_fuzzy_sql(
    mentions_sql: str, dict_sql: str, threshold: float = 0.5, k: int = 12, bands: int = 6
) -> str:
    """DuckDB twin of link_fuzzy, mirroring the banding EXACTLY (same
    md5('<i>:'||shingle) minhash permutations, same md5 band hashes), so
    the probabilistic candidate set — not just the verified survivors —
    is reproduced and the comparison is non-vacuous for the LSH stage.

    Spark's even/odd-id tagging is replaced by 'm:'/'d:' string-prefixed
    doc keys: the output columns never expose the ids, and candidate
    pairs are a function of (band, band_hash) alone, so the id scheme
    cancels out. mentions_sql must yield column `mention`; dict_sql
    columns (surface, uri)."""
    r = k // bands
    sig_cols = ",\n           ".join(
        f"MIN(md5('{i}:' || shingle)) AS sig_{i}" for i in range(k)
    )
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {bnd} AS band, md5("
        + " || '|' || ".join(f"sig_{bnd * r + j}" for j in range(r))
        + ") AS band_hash FROM sigs"
        for bnd in range(bands)
    )
    return f"""
    WITH d AS (SELECT surface, uri FROM {dict_sql}),
    m AS (SELECT DISTINCT mention FROM {mentions_sql}),
    docs AS (
        SELECT 'm:' || mention AS doc_id, mention AS txt FROM m
        UNION ALL
        SELECT DISTINCT 'd:' || surface, surface FROM d
    ),
    sh AS (
        -- generate_series as a scalar (list-returning) function: the
        -- table-function form rejects lateral column arguments
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   UNNEST(list_transform(
                       generate_series(1, greatest(length(txt) - 2, 1)),
                       i -> substring(txt, i, 3))) AS shingle
            FROM docs
        ) WHERE length(shingle) = 3
    ),
    sigs AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
    banded AS (
        {band_selects}
    ),
    cands AS (
        SELECT DISTINCT ma.doc_id AS m_id, db.doc_id AS d_id
        FROM banded ma JOIN banded db
          ON ma.band = db.band AND ma.band_hash = db.band_hash
        WHERE ma.doc_id LIKE 'm:%' AND db.doc_id LIKE 'd:%'
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.m_id, c.d_id, COUNT(*) AS n_int
        FROM cands c
        JOIN sh a ON a.doc_id = c.m_id
        JOIN sh b ON b.doc_id = c.d_id AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    verified AS (
        SELECT m_id, d_id,
               ROUND(n_int / (sa.n_sh + sb.n_sh - n_int), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = m_id
        JOIN sizes sb ON sb.doc_id = d_id
        WHERE ROUND(n_int / (sa.n_sh + sb.n_sh - n_int), 4) >= {threshold}
    )
    SELECT substring(v.m_id, 3) AS mention, d.surface, d.uri, v.jaccard
    FROM verified v JOIN d ON 'd:' || d.surface = v.d_id
    """


# --- sorted-neighborhood blocking --------------------------------------------

SN_WINDOW = 3


def _grams3_expr(col: str) -> str:
    """In-row distinct char-3-gram array (Spark SQL dialect)."""
    return (
        f"array_distinct(filter(transform("
        f"sequence(1, greatest(length({col}) - 2, 1)),"
        f" i -> substring({col}, i, 3)), s -> length(s) = 3))"
    )


def link_sorted_neighborhood(
    mention_surfaces: DataFrame,
    entity_dict: DataFrame,
    w: int = SN_WINDOW,
    threshold: float = 0.5,
) -> DataFrame:
    """The OTHER classical ER blocking family (sorted-neighborhood,
    Hernandez & Stolfo SIGMOD'95) as a cross-check to MinHash LSH
    (link_fuzzy): merge mentions and dictionary surfaces into one
    lexicographically sorted sequence, pair records at most `w` ranks
    apart, keep mention↔dict pairs, verify with exact char-3-gram
    Jaccard computed IN-ROW (no shingle shuffle — both strings are
    already in the candidate row).

    (mention, surface, uri, jaccard), jaccard >= threshold.

    Scale shape: the sort is BLOCKED by the 2-char key prefix, so the
    rank window is a partitionBy(prefix) row_number — never a global
    single-reducer window (round-3 verdict #1 lesson). The rank-
    adjacency join expands each row into `w` (block, rank+off) keys and
    equi-joins — hash shuffle on a slim composite key, no range-join
    scan. Cross-block neighbors are deliberately out of scope (standard
    blocked-SN semantics; the prefix split is part of the blocking key).
    Skewed prefixes ("th…" in English) split via AQE skew handling."""
    m = (
        mention_surfaces.select(F.col("mention").alias("key")).distinct()
        .withColumn("is_dict", F.lit(0))
        .withColumn("uri", F.lit(None).cast("string"))
    )
    d = entity_dict.select(
        F.col("surface").alias("key"), F.lit(1).alias("is_dict"), "uri"
    )
    u = m.unionByName(d).withColumn("block", F.substring("key", 1, 2))
    win = Window.partitionBy("block").orderBy("key", "is_dict", "uri")
    ranked = u.withColumn("rn", F.row_number().over(win))
    right = ranked.select(
        "block", F.col("rn").alias("rn_b"),
        F.col("key").alias("key_b"), F.col("is_dict").alias("db"), F.col("uri").alias("ub"),
    )
    left = ranked.select(
        "block", "rn", "key", "is_dict", "uri",
        F.explode(F.expr(f"sequence(1, {w})")).alias("off"),
    ).withColumn("rn_b", F.col("rn") + F.col("off"))
    pairs = (
        left.join(right, ["block", "rn_b"])
        .filter(F.col("is_dict") != F.col("db"))
        .select(
            F.when(F.col("is_dict") == 0, F.col("key")).otherwise(F.col("key_b")).alias("mention"),
            F.when(F.col("is_dict") == 1, F.col("key")).otherwise(F.col("key_b")).alias("surface"),
            F.when(F.col("is_dict") == 1, F.col("uri")).otherwise(F.col("ub")).alias("uri"),
        )
    )
    ga, gb = _grams3_expr("mention"), _grams3_expr("surface")
    jac = F.expr(
        f"round(size(array_intersect({ga}, {gb})) / "
        f"(size({ga}) + size({gb}) - size(array_intersect({ga}, {gb}))), 4)"
    )
    return pairs.withColumn("jaccard", jac).filter(F.col("jaccard") >= threshold)


def link_sorted_neighborhood_sql(
    mentions_sql: str, dict_sql: str, w: int = SN_WINDOW, threshold: float = 0.5
) -> str:
    """DuckDB twin: same blocked rank window, same pairing, same in-row
    3-gram Jaccard. NULL mention uris never participate in the ORDER BY
    tie-break (keys are unique within is_dict=0), so Spark's nulls-first
    vs DuckDB's nulls-last default cannot reorder ranks."""
    def grams(col: str) -> str:
        return (
            f"list_distinct(list_filter(list_transform("
            f"generate_series(1, greatest(length({col}) - 2, 1)),"
            f" i -> substring({col}, i, 3)), s -> length(s) = 3))"
        )

    return f"""
    WITH d AS (SELECT surface, uri FROM {dict_sql}),
    m AS (SELECT DISTINCT mention FROM {mentions_sql}),
    u AS (
        SELECT mention AS key, 0 AS is_dict, CAST(NULL AS VARCHAR) AS uri FROM m
        UNION ALL
        SELECT surface, 1, uri FROM d
    ),
    ranked AS (
        SELECT key, is_dict, uri, substring(key, 1, 2) AS block,
               ROW_NUMBER() OVER (
                   PARTITION BY substring(key, 1, 2)
                   ORDER BY key, is_dict, uri) AS rn
        FROM u
    ),
    pairs AS (
        SELECT CASE WHEN a.is_dict = 0 THEN a.key ELSE b.key END AS mention,
               CASE WHEN a.is_dict = 1 THEN a.key ELSE b.key END AS surface,
               CASE WHEN a.is_dict = 1 THEN a.uri ELSE b.uri END AS uri
        FROM ranked a JOIN ranked b
          ON a.block = b.block AND b.rn BETWEEN a.rn + 1 AND a.rn + {w}
        WHERE a.is_dict <> b.is_dict
    ),
    scored AS (
        SELECT mention, surface, uri,
               ROUND(len(list_intersect(ga, gb))
                     / (len(ga) + len(gb) - len(list_intersect(ga, gb))), 4) AS jaccard
        FROM (SELECT mention, surface, uri,
                     {grams('mention')} AS ga, {grams('surface')} AS gb
              FROM pairs)
    )
    SELECT * FROM scored WHERE jaccard >= {threshold}
    """


# --- entity co-occurrence ----------------------------------------------------

def entity_cooccurrence_pmi(mentions: DataFrame) -> DataFrame:
    """Pointwise mutual information over linked-entity pairs:
    (uri_a, uri_b, n_ab, pmi) for entities co-mentioned in a document —
    the statistical-association edge weight a KG adds on top of explicit
    triples (candidate relatedness edges, anchor-dictionary priors).

    pmi = ln(n_ab * N / (n_a * n_b)), N = docs with >= 1 linked entity.

    Scale shape: pairs are generated IN-ROW from the per-doc sorted
    entity set (collect_set is bounded by dictionary size per doc, not
    corpus size) — no mentions-self-join shuffle. Two slim shuffles
    (doc_id, then the pair key); the marginals frame is dictionary-sized
    and broadcast. Mega-docs mentioning every entity are bounded by the
    dictionary, not the text length."""
    ents = mentions.select("doc_id", "uri").distinct()
    per_doc = ents.groupBy("doc_id").agg(F.sort_array(F.collect_set("uri")).alias("us"))
    pairs = per_doc.select(
        F.explode(
            F.expr(
                "flatten(transform(us, (a, i) ->"
                " transform(slice(us, i + 2, size(us)),"
                " b -> struct(a AS uri_a, b AS uri_b))))"
            )
        ).alias("p")
    ).select("p.uri_a", "p.uri_b")
    n_ab = pairs.groupBy("uri_a", "uri_b").agg(F.count("*").alias("n_ab"))
    marg = ents.groupBy("uri").agg(F.count("*").alias("n"))
    total = ents.agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        n_ab.join(F.broadcast(marg.select(F.col("uri").alias("uri_a"), F.col("n").alias("n_a"))), "uri_a")
        .join(F.broadcast(marg.select(F.col("uri").alias("uri_b"), F.col("n").alias("n_b"))), "uri_b")
        .crossJoin(F.broadcast(total))
        .select(
            "uri_a", "uri_b", "n_ab",
            F.round(F.log(F.col("n_ab") * F.col("n_docs") / (F.col("n_a") * F.col("n_b"))), 4).alias("pmi"),
        )
    )


def entity_cooccurrence_pmi_sql(link_sql: str) -> str:
    """Oracle over a (doc_id, uri) mention relation; the pair generation
    is the plain self-join (quadratic is fine at oracle scale)."""
    return f"""
    WITH ents AS (SELECT DISTINCT doc_id, uri FROM {link_sql}),
    pairs AS (
        SELECT a.uri AS uri_a, b.uri AS uri_b, COUNT(*) AS n_ab
        FROM ents a JOIN ents b ON a.doc_id = b.doc_id AND a.uri < b.uri
        GROUP BY 1, 2
    ),
    marg AS (SELECT uri, COUNT(*) AS n FROM ents GROUP BY uri),
    tot AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ents)
    SELECT uri_a, uri_b, n_ab,
           ROUND(ln(n_ab * n_docs / (ca.n * cb.n)), 4) AS pmi
    FROM pairs
    JOIN marg ca ON ca.uri = uri_a
    JOIN marg cb ON cb.uri = uri_b
    CROSS JOIN tot
    """


# --- entity salience ------------------------------------------------------------

def entity_salience(docs: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Per-(document, entity) salience: how prominent each dictionary
    entity is inside each document that mentions it — the ranking signal
    a KG-construction pipeline attaches to extracted mentions so
    downstream consumers can keep only the entities a page is *about*,
    not every passing reference.

    (doc_id, surface, uri, n_mentions, first_pos, salience_e6) where
    first_pos is the 1-based token position of the earliest mention and
    salience_e6 = n_mentions·1e6 DIV n_tokens  +  1e6 DIV (9 + first_pos)
    — a density term plus an early-position bonus, all widened-integer
    arithmetic so the oracle hash is exact at any parallelism.

    Scale shape: tokenize + posexplode is map-side; the dictionary join
    is a broadcast hash join (the dict is bounded — top-K vocabulary or
    a curated table), so non-entity tokens are dropped before any
    exchange; the only shuffle is one (doc_id, surface)-keyed
    aggregation with map-side partials. No window, no self-join."""
    toks = docs.select(
        "doc_id",
        F.size(F.expr(_tokens("text"))).alias("__n_toks"),
        F.posexplode(F.expr(_tokens("text"))).alias("pos", "surface"),
    )
    ment = toks.join(F.broadcast(entity_dict.select("surface", "uri")), "surface")
    agg = ment.groupBy("doc_id", "surface", "uri").agg(
        F.count("*").alias("n_mentions"),
        (F.min("pos") + 1).cast("long").alias("first_pos"),
        F.min("__n_toks").alias("__n_toks"),
    )
    return agg.select(
        "doc_id",
        "surface",
        "uri",
        "n_mentions",
        "first_pos",
        F.expr(
            "CAST(n_mentions * 1000000 DIV __n_toks"
            " + 1000000 DIV (9 + first_pos) AS BIGINT)"
        ).alias("salience_e6"),
    )


def entity_salience_sql(docs_sql: str, dict_sql: str) -> str:
    """DuckDB twin: generate_subscripts/unnest positional stream, same
    integer salience grid."""
    toks = _tokens("text", "duckdb")
    return f"""
    WITH toks AS (
        SELECT doc_id, len(t) AS n_toks,
               generate_subscripts(t, 1) - 1 AS pos, unnest(t) AS surface
        FROM (SELECT doc_id, {toks} AS t FROM {docs_sql})
    ),
    agg AS (
        SELECT m.doc_id, m.surface, d.uri,
               COUNT(*) AS n_mentions,
               CAST(MIN(m.pos) + 1 AS BIGINT) AS first_pos,
               MIN(m.n_toks) AS n_toks
        FROM toks m JOIN {dict_sql} d USING (surface)
        GROUP BY m.doc_id, m.surface, d.uri
    )
    SELECT doc_id, surface, uri, n_mentions, first_pos,
           CAST(n_mentions * 1000000 // n_toks
                + 1000000 // (9 + first_pos) AS BIGINT) AS salience_e6
    FROM agg
    """
