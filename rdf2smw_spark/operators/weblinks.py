"""Web link-graph extraction: html → (src_url, href, anchor) edges,
anchor-text aggregation, in-degree top-k, and crawl-over-crawl diff.

This is the hyperlink half of web-scale KG construction (the north rule's
Common-Crawl shape): anchor text is the classic weak-label source for
entity surface forms, and the in-degree distribution drives crawl
prioritization. The reference (rdfio/rdf2smw) has no web front end — these
generalize its N-triples ingest the same way triplify.py does, per
SURVEY.md §7.

Every operator is pure JVM expressions (regexp_extract_all / groupBy), no
Python in the hot path, with a mirrored DuckDB oracle. The link regex is
RE2-compatible (no backreferences) so both engines compile it.

Scale shapes:
- extract_links: map-side only — decode + two regexp_extract_all passes
  zipped in-row, one explode. No shuffle; at 10^12 pages it is bounded by
  parquet scan throughput.
- anchor_stats: ONE shuffle on the slim href key with map-side partial
  aggregation. Mega-hub hrefs (a 10^9-in-degree homepage) are split by
  AQE skew handling; collect_set(anchor) is bounded in practice by
  anchor-text cardinality per target, and the distinct-count rewrites to
  the standard expand + two-phase agg.
- indegree_topk: TakeOrderedAndProject via topk.global_topk_ranked — no
  global window (round-3 verdict #1/#2 lesson).
- crawl_diff: groupBy url over capture fingerprints — one shuffle on the
  crawl's natural partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# href in group 1, anchor text in group 2. No backreferences/lookaround —
# RE2-safe for DuckDB, java.util.regex-safe for Spark.
LINK_RE = '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_url, href, anchor): every <a href> edge in every capture.

    Spark's regexp_extract_all returns ONE group index per call, so the
    href and anchor lists are extracted separately from the same pattern
    and zipped in-row — the two arrays are index-aligned by construction
    (same pattern, same subject string)."""
    h = F.decode(F.col("html"), "UTF-8")
    hrefs = F.regexp_extract_all(h, F.lit(LINK_RE), F.lit(1))
    anchors = F.regexp_extract_all(h, F.lit(LINK_RE), F.lit(2))
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(F.arrays_zip(hrefs.alias("href"), anchors.alias("anchor"))).alias("z"),
        )
        .select("src_url", F.col("z.href").alias("href"), F.col("z.anchor").alias("anchor"))
    )


def extract_links_sql(pages_sql: str) -> str:
    """DuckDB twin over VARCHAR html_str. DuckDB's regexp_extract_all
    has the same one-group-per-call shape; the two UNNESTs are zipped
    positionally with list indexing to stay index-aligned."""
    esc = LINK_RE.replace("'", "''")
    return f"""(
    WITH pages AS {pages_sql},
    m AS (
        SELECT url AS src_url,
               regexp_extract_all(html_str, '{esc}', 1) AS hrefs,
               regexp_extract_all(html_str, '{esc}', 2) AS anchors
        FROM pages
    )
    SELECT src_url, hrefs[i] AS href, anchors[i] AS anchor
    FROM m, UNNEST(generate_series(1, len(hrefs))) AS t(i)
)"""


def anchor_stats(edges: DataFrame) -> DataFrame:
    """Per-target link summary: (href, n_links, n_sources, anchors).

    `anchors` is the sorted distinct anchor-text set — the surface-form
    inventory entity linking consumes (anchor text ≈ mention of the
    target entity). One shuffle on href; deterministic at any
    parallelism via sort_array."""
    return edges.groupBy("href").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("src_url").alias("n_sources"),
        F.concat_ws("|", F.sort_array(F.collect_set("anchor"))).alias("anchors"),
    )


def anchor_stats_sql(edges_sql: str) -> str:
    return f"""
    SELECT href, COUNT(*) AS n_links, COUNT(DISTINCT src_url) AS n_sources,
           array_to_string(list_sort(list_distinct(list(anchor))), '|') AS anchors
    FROM {edges_sql}
    GROUP BY href
    """


def indegree_topk(edges: DataFrame, k: int = 25) -> DataFrame:
    """(rank, href, n_links): the k most-linked targets — crawl-frontier
    prioritization. TakeOrderedAndProject (per-partition heaps), never a
    global window."""
    from rdf2smw_spark.operators.topk import global_topk_ranked

    agg = edges.groupBy("href").agg(F.count("*").alias("n_links"))
    return global_topk_ranked(
        agg, [("n_links", "desc"), ("href", "asc")], k, rank_col="rank"
    ).select("rank", "href", "n_links")


def indegree_topk_sql(edges_sql: str, k: int = 25) -> str:
    return f"""
    SELECT ROW_NUMBER() OVER (ORDER BY n_links DESC, href) AS rank, href, n_links
    FROM (SELECT href, COUNT(*) AS n_links FROM {edges_sql} GROUP BY href)
    ORDER BY rank LIMIT {k}
    """


def crawl_diff(pages_with_text: DataFrame) -> DataFrame:
    """Crawl-over-crawl change detection (CDC over captures):
    (url, n_captures, n_versions, changed) — `changed` is true when two
    captures of the same url extracted different text. The comparison key
    is md5(text), so the shuffle carries a 32-byte fingerprint per
    capture, never the text itself — at 10^12 captures the exchange is
    ~decades smaller than shipping bodies."""
    fp = pages_with_text.select(
        "url", F.md5(F.encode(F.col("text"), "UTF-8")).alias("fp")
    )
    return fp.groupBy("url").agg(
        F.count("*").alias("n_captures"),
        F.countDistinct("fp").alias("n_versions"),
        (F.countDistinct("fp") > 1).alias("changed"),
    )


def crawl_diff_sql(pages_text_sql: str) -> str:
    """Oracle over a (url, text) relation."""
    return f"""
    SELECT url, COUNT(*) AS n_captures, COUNT(DISTINCT md5(text)) AS n_versions,
           COUNT(DISTINCT md5(text)) > 1 AS changed
    FROM {pages_text_sql}
    GROUP BY url
    """


def capture_history(pages_with_text: DataFrame) -> DataFrame:
    """SCD2 content-version history per url: (url, version, fp,
    valid_from, valid_to). Consecutive captures whose extracted text
    fingerprints match collapse into one validity interval; valid_to is
    NULL for the currently-live version — the slowly-changing-dimension
    table a temporal KG reads to answer "what did this page say at T"
    (web_asof_snapshot is the point read; this is the full history).

    Scale shape: the comparison key is md5(text) computed map-side, so
    the exchange carries 32-byte fingerprints; all three windows
    (lag-boundary, version row_number, lead valid_to) partition by url
    over the SAME ordering, so Catalyst collapses them into one Window
    operator after a single url-keyed exchange+sort — millions of small
    per-url partitions, never a global sort."""
    w = Window.partitionBy("url").orderBy("warc_ts")
    fp = pages_with_text.select(
        "url", "warc_ts", F.md5(F.encode(F.col("text"), "UTF-8")).alias("fp")
    )
    marked = fp.withColumn("__prev", F.lag("fp").over(w))
    # a capture starts a new version iff its fp differs from its predecessor;
    # the version's valid_to is the start of the NEXT boundary capture
    bounds = marked.filter(
        F.col("__prev").isNull() | (F.col("__prev") != F.col("fp"))
    )
    wv = Window.partitionBy("url").orderBy("warc_ts")
    return bounds.select(
        "url",
        F.row_number().over(wv).cast("long").alias("version"),
        "fp",
        F.col("warc_ts").alias("valid_from"),
        F.lead("warc_ts").over(wv).alias("valid_to"),
    )


def capture_history_sql(pages_text_sql: str) -> str:
    """DuckDB twin over a (url, warc_ts, text) relation."""
    return f"""
    WITH fp AS (
        SELECT url, warc_ts, md5(text) AS fp FROM {pages_text_sql}
    ),
    marked AS (
        SELECT url, warc_ts, fp,
               LAG(fp) OVER (PARTITION BY url ORDER BY warc_ts) AS prev
        FROM fp
    ),
    bounds AS (
        SELECT url, warc_ts, fp FROM marked
        WHERE prev IS NULL OR prev <> fp
    )
    SELECT url,
           CAST(ROW_NUMBER() OVER (PARTITION BY url ORDER BY warc_ts) AS BIGINT)
               AS version,
           fp,
           warc_ts AS valid_from,
           LEAD(warc_ts) OVER (PARTITION BY url ORDER BY warc_ts) AS valid_to
    FROM bounds
    """


# --- crawl frontier prioritization ---------------------------------------------

FRONTIER_PER_HOST = 10


def crawl_frontier(
    pages: DataFrame, edges: DataFrame, per_host: int = FRONTIER_PER_HOST
) -> DataFrame:
    """(host, url, n_refs, rank): the next URLs a crawler should fetch —
    link targets never captured yet, scored by referrer count, at most
    `per_host` per host (politeness: a host's fetch budget is the
    scheduling unit, so ranking is per-host BY CONSTRUCTION — the window
    partitions on host and can never degenerate to a global sort; hot
    hosts cost one fat-but-bounded partition, and AQE skew handling
    splits the count shuffle under them).

    Scale shape: referrer counts are one groupBy(href) with map-side
    partials; the uncrawled filter is a left-anti hash join against the
    (slim, distinct-url) capture list; the per-host top-k is a
    partitioned row_number. Ties break on url so the frontier is
    deterministic at any parallelism."""
    crawled = pages.select("url").distinct()
    refs = edges.groupBy("href").agg(F.countDistinct("src_url").alias("n_refs"))
    fresh = refs.join(crawled, refs.href == crawled.url, "left_anti")
    scored = fresh.select(
        F.regexp_extract("href", r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1).alias("host"),
        F.col("href").alias("url"),
        "n_refs",
    ).filter(F.col("host") != "")
    w = Window.partitionBy("host").orderBy(F.col("n_refs").desc(), "url")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_host)
    )


def crawl_frontier_sql(
    pages_sql: str, edges_sql: str, per_host: int = FRONTIER_PER_HOST
) -> str:
    """DuckDB twin: same anti join, same per-host ranked window."""
    return f"""
    WITH crawled AS (SELECT DISTINCT url FROM {pages_sql}),
    refs AS (
        SELECT href, COUNT(DISTINCT src_url) AS n_refs
        FROM {edges_sql} GROUP BY href
    ),
    fresh AS (
        SELECT r.href, r.n_refs FROM refs r
        WHERE NOT EXISTS (SELECT 1 FROM crawled c WHERE c.url = r.href)
    ),
    scored AS (
        SELECT regexp_extract(href, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
               href AS url, n_refs
        FROM fresh
    ),
    ranked AS (
        SELECT host, url, n_refs,
               ROW_NUMBER() OVER (PARTITION BY host
                                  ORDER BY n_refs DESC, url) AS rank
        FROM scored WHERE host <> ''
    )
    SELECT * FROM ranked WHERE rank <= {per_host}
    """


def anchor_entity_dict(edges: DataFrame, min_count: int = 1) -> DataFrame:
    """(surface, uri, priority, n_links, p_prior): the Wikipedia-anchor
    commonness prior P(entity | mention) — for each anchor surface, the
    targets it links to ranked by link count. This is how production
    entity linkers derive their dictionaries (anchor text is the weak
    label; the most-linked target is the canonical sense), and the
    output shape (surface, uri, priority) plugs directly into the LINK
    stage beside the corpus-frequency dictionary (linking.py).

    Determinism: ties rank by uri ascending. Plan: one (surface, uri)
    count aggregate with map-side partials, one per-surface total, one
    window bounded by the senses-per-surface cardinality (tiny —
    ambiguous anchors have dozens of senses, not millions), all on slim
    keys; nothing global."""
    from pyspark.sql import Window

    surf = F.lower(F.trim("anchor"))
    all_pairs = (
        edges.filter(F.length(surf) > 0)
        .groupBy(surf.alias("surface"), F.col("href").alias("uri"))
        .agg(F.count("*").alias("n_links"))
    )
    # the prior's denominator is ALL links for the mention — computed
    # BEFORE min_count prunes rare senses, else survivors' P(e|m) inflates
    totals = all_pairs.groupBy("surface").agg(F.sum("n_links").alias("__total"))
    pairs = all_pairs.filter(F.col("n_links") >= min_count)
    w = Window.partitionBy("surface").orderBy(
        F.col("n_links").desc(), F.col("uri")
    )
    return (
        pairs.join(totals, "surface")
        .withColumn("priority", F.row_number().over(w))
        .withColumn(
            "p_prior",
            F.round(F.col("n_links").cast("double") / F.col("__total"), 6),
        )
        .select("surface", "uri", "priority", "n_links", "p_prior")
    )


def anchor_entity_dict_sql(edges_sql: str, min_count: int = 1) -> str:
    return f"""
    WITH all_pairs AS (
        SELECT lower(trim(anchor)) AS surface, href AS uri, COUNT(*) AS n_links
        FROM {edges_sql}
        WHERE length(lower(trim(anchor))) > 0
        GROUP BY 1, 2
    ),
    totals AS (SELECT surface, SUM(n_links) AS total FROM all_pairs GROUP BY surface),
    pairs AS (SELECT * FROM all_pairs WHERE n_links >= {min_count})
    SELECT surface, uri,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY surface ORDER BY n_links DESC, uri) AS BIGINT)
               AS priority,
           n_links,
           ROUND(CAST(n_links AS DOUBLE) / total, 6) AS p_prior
    FROM pairs JOIN totals USING (surface)
    """
