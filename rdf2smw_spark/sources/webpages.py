"""Synthetic Common-Crawl-style `pages` table (BASELINE.json input_hint:
url, warc_ts, html BINARY, text, lang) derived deterministically from the
driver's documents.parquet — no external data, same rows at any
parallelism. 10% of urls get a second, later capture (latest-capture
dedup exercise, FIXTURES.md §1).

The html template embeds RDFa-style annotations (span property/datatype,
a property/href) that TRIPLIFY extracts. Both a DataFrame builder and the
mirrored DuckDB SQL are provided so every downstream query has an exact
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"

_HTML_PREFIX = "<html><head><title>Doc "
# template (single source of truth for both dialects):
# <html><head><title>Doc {id}</title></head><body><nav>site nav</nav>
# <h1>Doc {id}</h1><p>{escaped_text}</p>
# <span property="http://example.org/onto#source" datatype="http://www.w3.org/2001/XMLSchema#string">{source}</span>
# <span property="http://example.org/onto#nchars" datatype="http://www.w3.org/2001/XMLSchema#integer">{n_chars}</span>
# <a property="http://example.org/onto#sameAs" href="http://example.org/doc/{id}">self</a>
# <a rel="related" href="https://example.org/wiki/Doc_{(id*31+7)%997}">see also {(id*31+7)%997}</a>
# <footer>(c) example.org</footer></body></html>
#
# The related link (no property= attribute, so TRIPLIFY ignores it) gives
# the corpus a non-trivial hyperlink graph for operators/weblinks.py:
# targets collide mod 997, so in-degree varies and anchor aggregation is
# non-vacuous. The second capture appends a '<p>rev 2</p>' marker so
# crawl_diff sees real content drift.


def _escape_html(col):
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def _related_id() -> F.Column:
    # BIGINT before the multiply: ANSI mode overflows INT32 otherwise.
    return ((F.col("doc_id").cast("bigint") * 31 + 7) % 997).cast("string")


def _html_col() -> F.Column:
    i = F.col("doc_id").cast("string")
    return F.concat(
        F.lit("<html><head><title>Doc "), i,
        F.lit("</title></head><body><nav>site nav</nav><h1>Doc "), i,
        F.lit("</h1><p>"), _escape_html(F.col("text")),
        F.lit('</p><span property="http://example.org/onto#source" datatype="http://www.w3.org/2001/XMLSchema#string">'),
        F.col("source"),
        F.lit('</span><span property="http://example.org/onto#nchars" datatype="http://www.w3.org/2001/XMLSchema#integer">'),
        F.col("n_chars").cast("string"),
        F.lit('</span><a property="http://example.org/onto#sameAs" href="http://example.org/doc/'),
        i,
        F.lit('">self</a><a rel="related" href="https://example.org/wiki/Doc_'),
        _related_id(),
        F.lit('">see also '), _related_id(),
        F.lit("</a><footer>(c) example.org</footer></body></html>"),
    )


# Plan memo per (application, sf_dir) — same discipline as
# testdata_triples: caches the constructed logical plan only, never rows.
_PAGES_PLAN: dict[tuple[str, str], DataFrame] = {}


def synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PAGES_PLAN.get(key)
    if cached is None:
        cached = _build_synth_pages(spark, sf_dir)
        _PAGES_PLAN[key] = cached
    return cached


def _build_synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html BINARY, text, lang).
    `text` is NULL here — EXTRACT fills it; the raw document text is
    recoverable from html, which is the invariant under test."""
    from rdf2smw_spark.session import read_parquet_cached_schema

    docs = read_parquet_cached_schema(spark, f"{sf_dir}/documents.parquet")
    base = docs.select(
        F.concat(F.lit("https://example.org/"), "source", F.lit("/doc/"), F.col("doc_id").cast("string")).alias("url"),
        F.expr(f"timestampadd(SECOND, doc_id, timestamp'{BASE_TS}')").alias("warc_ts"),
        _html_col().alias("html_str"),
        "doc_id", "text", "source", "n_chars", "lang",
    )
    first = base.select(
        "url", "warc_ts", F.encode("html_str", "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"), "lang",
    )
    # second capture, 1 hour later, with a content revision marker
    # (crawl_diff must see real drift, not identical bytes)
    dup = base.filter(F.col("doc_id") % 10 == 0).select(
        "url",
        F.expr("timestampadd(HOUR, 1, warc_ts)").alias("warc_ts"),
        F.encode(F.concat("html_str", F.lit("<p>rev 2</p>")), "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        "lang",
    )
    return first.unionByName(dup)


def duckdb_pages_sql() -> str:
    """Mirrored derivation for the oracle; html kept as VARCHAR
    (DuckDB side never needs the binary round-trip — the Spark side
    decode()s back to the same string)."""
    esc = "replace(replace(replace(text,'&','&amp;'),'<','&lt;'),'>','&gt;')"
    html = (
        "'<html><head><title>Doc ' || doc_id || '</title></head><body>"
        "<nav>site nav</nav><h1>Doc ' || doc_id || '</h1><p>' || " + esc + " || "
        "'</p><span property=\"http://example.org/onto#source\" "
        "datatype=\"http://www.w3.org/2001/XMLSchema#string\">' || source || "
        "'</span><span property=\"http://example.org/onto#nchars\" "
        "datatype=\"http://www.w3.org/2001/XMLSchema#integer\">' || n_chars || "
        "'</span><a property=\"http://example.org/onto#sameAs\" "
        "href=\"http://example.org/doc/' || doc_id || '\">self</a>"
        "<a rel=\"related\" href=\"https://example.org/wiki/Doc_' || "
        "((doc_id * 31 + 7) % 997) || '\">see also ' || "
        "((doc_id * 31 + 7) % 997) || "
        "'</a><footer>(c) example.org</footer></body></html>'"
    )
    return f"""(
    SELECT 'https://example.org/' || source || '/doc/' || doc_id AS url,
           TIMESTAMP '{BASE_TS}' + to_seconds(doc_id) AS warc_ts,
           {html} AS html_str,
           lang
    FROM documents
    UNION ALL
    SELECT 'https://example.org/' || source || '/doc/' || doc_id,
           TIMESTAMP '{BASE_TS}' + to_seconds(doc_id) + INTERVAL 1 HOUR,
           {html} || '<p>rev 2</p>',
           lang
    FROM documents WHERE (doc_id % 10) = 0
)"""
