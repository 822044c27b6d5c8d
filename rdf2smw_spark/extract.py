"""EXTRACT stage: html BINARY → text (pipeline stage 1, SURVEY.md §7).

The extraction is a pinned, deterministic rule chain (no versioned HTML
parser dependency), so `text` is byte-identical per url across runs and
parallelism levels — the BASELINE.json per-row invariant. The rules are
declared once and compiled two ways:

- a vectorized pandas UDF (Arrow-batched) for the real pipeline — this is
  the north_star-mandated shape for the web front end; and
- a DuckDB regexp chain (oracle), RE2-compatible by construction (no
  backreferences/lookaround).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# (pattern, replacement), applied in order. RE2- and python-re-compatible.
STRIP_BLOCKS = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<head\b[^>]*>.*?</head>", " "),
    (r"(?is)<nav\b[^>]*>.*?</nav>", " "),
    (r"(?is)<footer\b[^>]*>.*?</footer>", " "),
    (r"(?s)<[^>]*>", " "),
]
UNESCAPE_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so double-escapes resolve one level only
]
COLLAPSE_WS = (r"\s+", " ")

_COMPILED = [(re.compile(p), r) for p, r in STRIP_BLOCKS]
_WS = re.compile(COLLAPSE_WS[0])


def py_extract_text(html: str) -> str:
    for rx, repl in _COMPILED:
        html = rx.sub(repl, html)
    for old, new in UNESCAPE_ENTITIES:
        html = html.replace(old, new)
    return _WS.sub(COLLAPSE_WS[1], html).strip()


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    # html arrives as bytes (BinaryType); decode then run the rule chain
    return html.map(lambda b: py_extract_text(b.decode("utf-8", errors="replace")))


def extract_text(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> same + text filled."""
    return pages.withColumn("text", extract_text_udf(F.col("html")))


def latest_capture(pages: DataFrame) -> DataFrame:
    """Crawl-snapshot dedup: keep the newest warc_ts per url
    (SURVEY.md §2.9 window). At scale this is one shuffle on url —
    the same key the downstream extraction partitions by."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (
        pages.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# host/section terminate at /, ? and # — a path-less URL like
# https://ads.example.com?track=1 must still parse host
# 'ads.example.com' (otherwise the blocklist gate is bypassable)
HOST_RE = "https?://([^/?#]+)"
SECTION_RE = "https?://[^/?#]+/([^/?#]+)"


def site_stats(pages: DataFrame) -> DataFrame:
    """Per-site crawl statistics: (host, section, n_captures, n_urls,
    n_langs, first_ts, last_ts). `section` is the first path segment —
    the partition a crawl operator actually monitors (host alone is too
    coarse for large sites).

    Plan at 10^12 captures: host/section parse is a map-side regexp
    (whole-stage codegen), the aggregation is ONE shuffle on the slim
    (host, section) key with partial aggregation map-side; the distinct
    counts rewrite to expand + two-phase agg, still one exchange. Skewed
    mega-sites are handled by AQE partition splitting (session.py)."""
    host = F.regexp_extract("url", HOST_RE, 1)
    section = F.regexp_extract("url", SECTION_RE, 1)
    return (
        pages.select(
            host.alias("host"), section.alias("section"), "url", "warc_ts", "lang"
        )
        .groupBy("host", "section")
        .agg(
            F.count("*").alias("n_captures"),
            F.countDistinct("url").alias("n_urls"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
        )
    )


def site_stats_sql(pages_sql: str) -> str:
    """DuckDB twin of site_stats (same regexes, same aggregate names)."""
    return f"""
    WITH pages AS {pages_sql}
    SELECT regexp_extract(url, '{HOST_RE}', 1) AS host,
           regexp_extract(url, '{SECTION_RE}', 1) AS section,
           COUNT(*) AS n_captures,
           COUNT(DISTINCT url) AS n_urls,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(warc_ts) AS first_ts,
           MAX(warc_ts) AS last_ts
    FROM pages
    GROUP BY 1, 2
    """


def duckdb_extract_sql(expr: str) -> str:
    """Oracle: the same rule chain over a VARCHAR html column."""
    out = expr
    for pat, repl in STRIP_BLOCKS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    for old, new in UNESCAPE_ENTITIES:
        old_q = old.replace("'", "''")
        new_q = new.replace("'", "''")
        out = f"replace({out}, '{old_q}', '{new_q}')"
    out = f"regexp_replace({out}, '{COLLAPSE_WS[0]}', ' ', 'g')"
    return f"trim({out})"


# --- URL canonicalization ----------------------------------------------------

def canonical_url_sql(col: str, dialect: str = "spark") -> str:
    """Pinned URL canonicalization (the crawl-frontier dedup key):
    drop the #fragment, lowercase scheme+host, strip default :80/:443
    ports, drop a trailing slash on the path, sort query parameters.
    One expression, both dialects — pure string/list builtins, a
    map-side projection with no shuffle at any scale."""
    if dialect == "duckdb":
        split1 = "string_split({s}, '{d}')[1]"
        split2 = "string_split({s}, '{d}')[2]"
        nparts = "len(string_split({s}, '{d}'))"
        sortq = "array_to_string(list_sort(string_split({q}, '&')), '&')"
    else:
        split1 = "element_at(split({s}, '{d}'), 1)"
        split2 = "element_at(split({s}, '{d}'), 2)"
        nparts = "size(split({s}, '{d}'))"
        sortq = "concat_ws('&', array_sort(split({q}, '&')))"
    # 1. fragment off ('#' is not regex-special in either split)
    nofrag = split1.format(s=col, d="#")
    # 2. scheme://host[:port] head, lowercased, default ports stripped
    head = f"regexp_replace(lower(regexp_extract({nofrag}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*', 0)), ':(80|443)$', '')"
    tail = f"substring({nofrag}, length(regexp_extract({nofrag}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*', 0)) + 1)"
    # 3. split path from query ('?' needs escaping for Spark's regex split)
    qmark = "[?]" if dialect == "spark" else "?"
    path = split1.format(s=tail, d=qmark)
    query = split2.format(s=tail, d=qmark)
    has_q = f"{nparts.format(s=tail, d=qmark)} > 1"
    # 4. trailing slash off the path, sorted query back on
    cpath = f"regexp_replace({path}, '/$', '')"
    return (
        f"CASE WHEN {has_q} THEN concat({head}, {cpath}, '?', {sortq.format(q=query)}) "
        f"ELSE concat({head}, {cpath}) END"
    )


def canonical_urls(pages: DataFrame) -> DataFrame:
    """(url, canon_url): the canonicalization projection."""
    return pages.select("url", F.expr(canonical_url_sql("url", "spark")).alias("canon_url"))


def messy_urls(pages: DataFrame) -> DataFrame:
    """Deterministic messy-variant augmentation (the planted-positive
    pattern of near_dup_embeddings): every page whose url length is
    divisible by 3 also appears with an uppercased scheme+host, an
    explicit :443 port, unsorted query params, and a fragment — so the
    canonicalization oracle compares non-vacuous collapses. Mirrored
    verbatim in messy_urls_sql."""
    base = pages.select("url")
    variants = base.filter(F.length("url") % 3 == 0).select(
        F.concat(
            F.upper(F.expr("substring(url, 1, 20)")),
            F.expr("substring(url, 21, 999999)"),
            F.lit("?b=2&a=1#frag"),
        ).alias("url")
    )
    # the planted port: rewrite 'https://example.org/' -> ':443/'
    variants = variants.select(
        F.expr(
            "regexp_replace(url, '^([a-zA-Z]+://[^/]*)/', '$1:443/')"
        ).alias("url")
    )
    return base.unionByName(variants)


def messy_urls_sql(pages_sql: str) -> str:
    return f"""(
    WITH pages AS {pages_sql}
    SELECT url FROM pages
    UNION ALL
    SELECT regexp_replace(
               upper(substring(url, 1, 20)) || substring(url, 21, 999999)
               || '?b=2&a=1#frag',
               '^([a-zA-Z]+://[^/]*)/', '\\1:443/')
    FROM pages WHERE length(url) % 3 = 0
)"""


# --- as-of (time-travel) snapshot -----------------------------------------------

ASOF_CUTOFF = "2024-01-01 01:30:00"


def asof_snapshot(pages: DataFrame, cutoff: str = ASOF_CUTOFF) -> DataFrame:
    """Crawl state as-of a timestamp: for each url, the newest capture
    with warc_ts <= cutoff — the time-travel read a temporal KG serves
    ("what did the graph say last Tuesday"). Urls first crawled after
    the cutoff are absent; urls re-crawled after it resolve to the
    pre-cutoff capture. Returns (url, warc_ts, html_len).

    Scale shape: deliberately NOT the row_number window latest_capture
    uses — the arg-max folds into ONE groupBy(url) with a max(struct)
    aggregate, so it gets map-side partial aggregation (each input
    partition pre-reduces to one candidate per url before the exchange)
    instead of shipping every capture of every url to its reducer and
    sorting there. Same answer, strictly less shuffled data — the shape
    that matters when hot urls have thousands of captures. warc_ts
    leads the struct, so struct ordering IS recency (ts is unique per
    url; html_len only rides along)."""
    cap = pages.filter(F.col("warc_ts") <= F.lit(cutoff).cast("timestamp")).select(
        "url",
        F.struct(
            "warc_ts", F.length(F.decode(F.col("html"), "UTF-8")).cast("long").alias("html_len")
        ).alias("__cap"),
    )
    return (
        cap.groupBy("url")
        .agg(F.max("__cap").alias("__cap"))
        .select("url", "__cap.warc_ts", "__cap.html_len")
    )


def asof_snapshot_sql(pages_sql: str, cutoff: str = ASOF_CUTOFF) -> str:
    """DuckDB twin (the oracle may use the window form; the Spark plan
    must not be single-reducer — this one is partitioned by url)."""
    return f"""
    WITH pages AS {pages_sql},
    ranked AS (
        SELECT url, warc_ts, CAST(length(html_str) AS BIGINT) AS html_len,
               ROW_NUMBER() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
        FROM pages
        WHERE warc_ts <= TIMESTAMP '{cutoff}'
    )
    SELECT url, warc_ts, html_len FROM ranked WHERE rn = 1
    """


def blocklist_filter(pages: DataFrame, blocked_hosts: DataFrame) -> DataFrame:
    """URL-level curation gate (the CCNet/RefinedWeb domain blocklist):
    drop pages whose host — or any registrable parent domain of it —
    appears in `blocked_hosts` (one `host` column). Subdomain semantics
    match production blocklists: blocking ads.example.com also blocks
    tracker.ads.example.com but NOT example.com.

    Scale shape: the host parse is a map-side regexp; the candidate
    set explodes each url's host into its ≤ depth parent suffixes
    (bounded by hostname depth, ~5) and semi-joins the blocklist —
    broadcast when small (the usual case: blocklists are KB-MB), AQE
    decides otherwise. No per-row Python, no driver lookup table."""
    # normalized host: strip userinfo (user@), :port, and trailing FQDN
    # dots — otherwise https://ads.example.com:8443/ or user@-urls bypass
    # the blocklist (host 'ads.example.com:8443' matches no suffix)
    host = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.regexp_extract("url", HOST_RE, 1)), "^[^@]*@", ""
            ),
            ":[0-9]+$", "",
        ),
        r"\.+$", "",
    )
    # suffixes: for a.b.c -> [a.b.c, b.c, c]
    cand = pages.withColumn("__host", host).withColumn(
        "__sfx",
        F.explode(F.expr(
            "transform(sequence(1, size(split(__host, '\\\\.'))), "
            "i -> array_join(slice(split(__host, '\\\\.'), i, 1000), '.'))"
        )),
    )
    blocked = blocked_hosts.select(F.lower("host").alias("__sfx")).distinct()
    hit_urls = cand.join(blocked, "__sfx", "left_semi").select("url").distinct()
    return pages.join(hit_urls, "url", "left_anti")


def blocklist_filter_sql(pages_sql: str, blocked_hosts_sql: str) -> str:
    return f"""
    WITH p AS (SELECT * FROM {pages_sql}),
    cand AS (
        SELECT url, array_to_string(parts[i:len(parts)], '.') AS sfx
        FROM (SELECT url,
                     string_split(
                         regexp_replace(regexp_replace(regexp_replace(
                             lower(regexp_extract(url, '{HOST_RE}', 1)),
                             '^[^@]*@', ''), ':[0-9]+$', ''), '\\.+$', ''),
                         '.') AS parts
              FROM p),
             UNNEST(generate_series(1, len(parts))) AS t(i)
    ),
    blocked AS (SELECT DISTINCT lower(host) AS sfx FROM {blocked_hosts_sql}),
    hit AS (SELECT DISTINCT url FROM cand SEMI JOIN blocked USING (sfx))
    SELECT p.* FROM p ANTI JOIN hit USING (url)
    """


# --- robots.txt-style crawl gate ----------------------------------------------------

PATH_RE = "https?://[^/?#]+([^?#]*)"


def robots_gate(pages: DataFrame, robots: DataFrame) -> DataFrame:
    """(url, host, matched_prefix, allowed): per-URL robots decision —
    the crawl-politeness gate of a web-corpus pipeline. `robots` carries
    one parsed rule per row (host, prefix, allow); the REP subset is
    literal path prefixes with longest-match-wins and allow-wins-ties
    (the Robots Exclusion Protocol precedence, RFC 9309 §2.2.2), and a
    URL whose host has no matching rule — or no rules at all — is
    allowed. Rules key on the EXACT host (robots.txt is served per
    host), unlike blocklist_filter's registrable-suffix semantics.

    Scale shape: host/path parse is a map-side regexp; the rule match
    is one equi-join on host (robots tables are ~#hosts — shuffled,
    AQE broadcasts when small) followed by a prefix filter and one
    max(struct) aggregation per url — no window, no per-row Python."""
    host = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.regexp_extract("url", HOST_RE, 1)), "^[^@]*@", ""
            ),
            ":[0-9]+$", "",
        ),
        r"\.+$", "",
    )
    path = F.regexp_extract("url", PATH_RE, 1)
    parsed = pages.select(
        "url",
        host.alias("host"),
        F.when(path == "", "/").otherwise(path).alias("path"),
    )
    rules = robots.select(
        F.lower("host").alias("host"), F.col("prefix"),
        F.when(F.col("allow"), 1).otherwise(0).alias("al"),
    )
    best = (
        parsed.join(rules, "host")
        .filter(F.col("path").startswith(F.col("prefix")))
        .groupBy("url")
        # lexicographic max = longest prefix, then allow over deny;
        # equal (len, al) implies an identical prefix string
        .agg(F.max(F.struct(
            F.length("prefix").alias("ln"), F.col("al"), F.col("prefix")
        )).alias("b"))
    )
    return parsed.join(best, "url", "left").select(
        "url", "host",
        F.col("b.prefix").alias("matched_prefix"),
        (F.col("b.al").isNull() | (F.col("b.al") == 1)).alias("allowed"),
    )


def robots_gate_sql(pages_sql: str, robots_sql: str) -> str:
    return f"""
    WITH parsed AS (
        SELECT url,
               regexp_replace(regexp_replace(regexp_replace(
                   lower(regexp_extract(url, '{HOST_RE}', 1)),
                   '^[^@]*@', ''), ':[0-9]+$', ''), '\\.+$', '') AS host,
               CASE WHEN regexp_extract(url, '{PATH_RE}', 1) = '' THEN '/'
                    ELSE regexp_extract(url, '{PATH_RE}', 1) END AS path
        FROM {pages_sql}
    ),
    rules AS (
        SELECT lower(host) AS host, prefix,
               CASE WHEN allow THEN 1 ELSE 0 END AS al
        FROM {robots_sql}
    ),
    m AS (
        SELECT url, prefix, al,
               ROW_NUMBER() OVER (
                   PARTITION BY url
                   ORDER BY length(prefix) DESC, al DESC, prefix DESC
               ) AS rn
        FROM parsed JOIN rules USING (host)
        WHERE starts_with(path, prefix)
    )
    SELECT p.url, p.host, b.prefix AS matched_prefix,
           (b.al IS NULL OR b.al = 1) AS allowed
    FROM parsed p LEFT JOIN (SELECT * FROM m WHERE rn = 1) b USING (url)
    """
