"""TRIPLIFY stage: html → (subj, pred, obj) candidate triples
(pipeline stage 2, SURVEY.md §7; generalizes the reference's N-triples
decode front end to web pages per the north rule).

Extracts RDFa-style annotations:
- <span property="P" datatype="D">V</span>  → literal triple (url, P, V, D)
- <a property="P" href="O">…</a>            → IRI triple (url, P, O)
- <title>T</title>                           → (url, ont#title, T, xsd:string)

mapInPandas flatMap (one page → n triples), Arrow-batched; the DuckDB
oracle mirrors it with regexp_extract_all.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from rdf2smw_spark.schemas import DT_STRING

TITLE_PRED = "http://example.org/onto#title"

_SPAN = re.compile(r'<span property="([^"]*)" datatype="([^"]*)">([^<]*)</span>')
_LINK = re.compile(r'<a property="([^"]*)" href="([^"]*)">')
_TITLE = re.compile(r"<title>([^<]*)</title>")

TRIPLIFY_SCHEMA = (
    "subj string, pred string, obj string, obj_is_iri boolean, "
    "obj_datatype string, src_url string"
)


def py_triplify(url: str, html: str) -> list[tuple]:
    out: list[tuple] = []
    m = _TITLE.search(html)
    if m:
        out.append((url, TITLE_PRED, m.group(1), False, DT_STRING, url))
    for pred, dt, val in _SPAN.findall(html):
        out.append((url, pred, val, False, dt, url))
    for pred, href in _LINK.findall(html):
        out.append((url, pred, href, True, None, url))
    return out


def triplify(pages: DataFrame) -> DataFrame:
    """pages(url, html BINARY, ...) → TRIPLE_SCHEMA rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "src_url"]
        for pdf in it:
            rows: list[tuple] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                rows.extend(py_triplify(url, html.decode("utf-8", errors="replace")))
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(batches, schema=TRIPLIFY_SCHEMA)


def duckdb_triplify_sql(pages_expr: str) -> str:
    """Oracle over VARCHAR html (`html_str`): same three extractions,
    flattened with UNNEST. Assumes `pages_expr` is a subquery with
    (url, html_str) — the synthetic corpus has exactly one <title> and
    annotation attributes in fixed order, which the regexes rely on in
    both dialects."""
    return f"""(
    SELECT url AS subj, '{TITLE_PRED}' AS pred,
           regexp_extract(html_str, '<title>([^<]*)</title>', 1) AS obj,
           false AS obj_is_iri, '{DT_STRING}' AS obj_datatype, url AS src_url
    FROM {pages_expr}
    WHERE regexp_matches(html_str, '<title>')
    UNION ALL
    SELECT url,
           regexp_extract(s, '<span property="([^"]*)"', 1),
           regexp_extract(s, '>([^<]*)</span>', 1),
           false,
           regexp_extract(s, 'datatype="([^"]*)"', 1),
           url
    FROM (
        SELECT url, UNNEST(regexp_extract_all(html_str,
            '<span property="[^"]*" datatype="[^"]*">[^<]*</span>')) AS s
        FROM {pages_expr}
    )
    UNION ALL
    SELECT url,
           regexp_extract(a, '<a property="([^"]*)"', 1),
           regexp_extract(a, 'href="([^"]*)"', 1),
           true,
           NULL,
           url
    FROM (
        SELECT url, UNNEST(regexp_extract_all(html_str,
            '<a property="[^"]*" href="[^"]*">')) AS a
        FROM {pages_expr}
    )
)"""
