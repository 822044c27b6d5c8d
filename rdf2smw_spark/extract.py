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


HOST_RE = "https?://([^/]+)"
SECTION_RE = "https?://[^/]+/([^/]+)"


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
