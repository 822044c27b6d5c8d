"""Byte-exact string normalization (reference parity layer).

Single source of truth for every character-level transform the reference
performs, exposed three ways:

1. SQL-expression generators with a ``dialect`` flag ('spark' | 'duckdb') —
   the SAME generator builds the Spark plan (via F.expr) and the DuckDB
   oracle SQL, so the driver's side-by-side comparison is exact by
   construction. All Spark-side execution stays JVM/codegen (no Python).
2. Plain-Python reference implementations (suffix ``py_``) used by the
   byte-exact pandas UDF for title truncation and by unit tests.
3. A vectorized pandas UDF for the one transform built-ins can't express:
   Go byte-length word-drop truncation (reference
   triplestowikipageconv.go:243-252).

Transform provenance (all /root/reference/components/):
- P2 literal cleanup regexes: triplestowikipageconv.go:71-75 (applied to
  values :116-118 and titles :239-241)
- P3 fact-value escaping: iptypes.go:103-111 (= mwxmlcreator.go:165-173)
- P4 title char cleanup (13 ordered replacements): triplestowikipageconv.go:224-236
- P5 title truncation (byte semantics): triplestowikipageconv.go:243-252,302-306
- P6 upperCaseFirst (first BYTE, i.e. ASCII-only): triplestowikipageconv.go:294-300
- P7 local-name fallback: triplestowikipageconv.go:216-221
- P9 spacesToUnderscores: mwxmlcreator.go:160-162
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Ordered replacement tables — order matters, mirror the reference exactly.
TITLE_REPLACEMENTS: list[tuple[str, str]] = [
    ("[", "("),
    ("]", ")"),
    ("{", "("),
    ("}", ")"),
    ("|", " "),
    ("#", " "),
    ("<", "less than"),
    (">", "greater than"),
    ("?", " "),
    ("&", " "),
    (",", " "),  # comma is the template multi-value separator
    (".", " "),
    ("=", "-"),
]

ESCAPE_REPLACEMENTS: list[tuple[str, str]] = [
    ("[", "("),
    ("]", ")"),
    ("|", ","),
    ("=", "-"),
    ("<", "&lt;"),
    (">", "&gt;"),
]

# P2 qualifier-stripping regexes. Two dialect forms: Java regex treats
# '[[]' as a nested character-class union, so Spark gets backslash escapes
# (doubled when embedded in a SQL string literal, since Spark's parser
# processes escapes); DuckDB/RE2 gets the Go-style bracket form verbatim.
CLEANUP_REGEXES_SPARK: list[str] = [
    r" \([^)]*:[^)]*\)",
    r" \[[^\]]*:[^\]]*\]",
]
CLEANUP_REGEXES_DUCKDB: list[str] = [
    " [(][^)]*:[^)]*[)]",
    " [[][^]]*:[^]]*[]]",
]

TITLE_MAX = 250  # Go: for len(factTitle) >= 250 { dropLastWord }


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _replace_chain(expr: str, table: list[tuple[str, str]]) -> str:
    """Nested replace(...) calls; replace() semantics agree across dialects."""
    out = expr
    for old, new in table:
        out = f"replace({out}, {_sql_quote(old)}, {_sql_quote(new)})"
    return out


def _regexp_strip(expr: str, dialect: str) -> str:
    out = expr
    if dialect == "duckdb":
        for rx in CLEANUP_REGEXES_DUCKDB:
            out = f"regexp_replace({out}, {_sql_quote(rx)}, '', 'g')"
    else:  # spark: regexp_replace is global; double backslashes for the
        # SQL string-literal parser
        for rx in CLEANUP_REGEXES_SPARK:
            q = _sql_quote(rx.replace("\\", "\\\\"))
            out = f"regexp_replace({out}, {q}, '')"
    return out


def sql_clean_literal(expr: str, dialect: str = "spark") -> str:
    """P2: strip ' (ns:q)' / ' [ns:q]' qualifiers from literal values."""
    return _regexp_strip(expr, dialect)


def sql_escape_wiki_chars(expr: str, dialect: str = "spark") -> str:
    """P3: escape fact values for wikitext."""
    return _replace_chain(expr, ESCAPE_REPLACEMENTS)


def sql_spaces_to_underscores(expr: str) -> str:
    """P9: template argument names."""
    return f"replace({expr}, ' ', '_')"


def sql_local_name(expr: str, dialect: str = "spark") -> str:
    """P7: URI → local name (split '#' take last, split '/' take last)."""
    if dialect == "duckdb":
        return f"(string_split((string_split({expr}, '#'))[-1], '/'))[-1]"
    return f"element_at(split(element_at(split({expr}, '#'), -1), '/'), -1)"


def sql_upper_first(expr: str, dialect: str = "spark") -> str:
    """P6: uppercase the first byte — Go ToUpper on one byte only affects
    ASCII a-z, so gate on the first character being ascii lowercase."""
    return (
        f"CASE WHEN ascii({expr}) BETWEEN 97 AND 122 "
        f"THEN concat(upper(substring({expr}, 1, 1)), substring({expr}, 2)) "
        f"ELSE {expr} END"
    )


def sql_wiki_title_clean(expr: str, dialect: str = "spark") -> str:
    """P4 char cleanup → P2 regex cleanup → P6 upper-first.

    Truncation (P5) is intentionally NOT part of this expression: it needs
    a byte-length loop (pandas UDF, see truncate_long_titles); callers
    route only titles with octet_length >= TITLE_MAX through that UDF so
    the hot path stays JVM-side.
    """
    out = _replace_chain(expr, TITLE_REPLACEMENTS)
    out = _regexp_strip(out, dialect)
    return sql_upper_first(out, dialect)


def sql_smw_type(is_iri_expr: str, datatype_expr: str) -> str:
    """T2: observed object → SMW 'Has type' value (Page/Text/Number/NULL).

    Reference: triplestowikipageconv.go:110,120-132 — only the 4 listed
    datatypes produce a fact; everything else yields none (NULL here).
    """
    return (
        f"CASE WHEN {is_iri_expr} THEN 'Page' "
        f"WHEN {datatype_expr} IN ("
        "'http://www.w3.org/2001/XMLSchema#string',"
        "'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString') THEN 'Text' "
        f"WHEN {datatype_expr} IN ("
        "'http://www.w3.org/2001/XMLSchema#integer',"
        "'http://www.w3.org/2001/XMLSchema#float') THEN 'Number' "
        "ELSE NULL END"
    )


def spark_truncate_title(expr: str) -> str:
    """P5 as a pure-JVM expression (Spark dialect only) — no Python UDF in
    the hot path. Semantics: largest whole-word prefix with utf-8 byte
    length < TITLE_MAX, ' ...' appended when anything was dropped; a
    single >=TITLE_MAX-byte word truncates to ' ...' (matches Go's
    strings.Split/Join round trip on bits[:0]).

    Prefix byte lengths are monotone nondecreasing in word count, so the
    last qualifying prefix found by a left fold is the maximum.
    """
    words = f"split({expr}, ' ')"
    folded = (
        f"aggregate({words}, named_struct('k', 0, 'len', 0, 'best', 0), "
        f"(acc, w) -> named_struct("
        f"'k', acc.k + 1, "
        f"'len', acc.len + octet_length(w) + IF(acc.k = 0, 0, 1), "
        f"'best', IF(acc.len + octet_length(w) + IF(acc.k = 0, 0, 1) < {TITLE_MAX}, acc.k + 1, acc.best)), "
        f"acc -> acc.best)"
    )
    return (
        f"IF(octet_length({expr}) < {TITLE_MAX}, {expr}, "
        f"concat(array_join(slice({words}, 1, {folded}), ' '), ' ...'))"
    )


def _let(expr: str, var: str, body: str, dialect: str = "spark") -> str:
    """SQL let-binding via a single-element transform(): evaluates `expr`
    exactly once and binds it to `var` inside `body`. Without this, the
    generated title chain is textually re-inlined at every reference
    (~6x per row, and the truncation fold blocks whole-stage codegen, so
    each copy is interpreted) — measured 2x+ on the conversion stage."""
    if dialect == "duckdb":
        return f"(list_transform([{expr}], {var} -> {body}))[1]"
    return f"element_at(transform(array({expr}), {var} -> {body}), 1)"


def sql_wiki_title_full(expr: str, dialect: str = "spark") -> str:
    """Complete factTitle conversion (all engine-side, no Python):
    P4 chars → P2 regexes → P5 truncation → P6 upper-first.
    Reference order: triplestowikipageconv.go:223-254.

    The 'duckdb' dialect mirrors the truncation fold so the oracle is
    valid for >=250-byte titles too (round-1 advice: the oracle used the
    truncation-free chain, so long titles would hash-mismatch — or mask
    a Spark truncation bug; testdata now plants one).

    The cleaned value and the truncated value are each computed once via
    let-bindings; all later references are O(1) lambda-variable reads."""
    if dialect == "duckdb":
        cleaned = _regexp_strip(_replace_chain(expr, TITLE_REPLACEMENTS), "duckdb")
        words = "string_split(__t, ' ')"
        # DuckDB 1.0 lambdas carry no index — generate_series supplies it;
        # strlen() is BYTE length (octet_length is blob-only there).
        best = (
            f"coalesce(list_max(list_transform(generate_series(1, len({words})), "
            f"i -> CASE WHEN strlen(array_to_string(list_slice({words}, 1, i), ' ')) "
            f"< {TITLE_MAX} THEN i ELSE 0 END)), 0)"
        )
        # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
        # array_join([]) is '' — a single >=250-byte word must yield ' ...'
        truncated = (
            f"CASE WHEN strlen(__t) < {TITLE_MAX} THEN __t "
            f"ELSE coalesce(array_to_string(list_slice({words}, 1, {best}), ' '), '') || ' ...' END"
        )
        uppered = (
            "CASE WHEN ascii(__s) BETWEEN 97 AND 122 "
            "THEN upper(substring(__s, 1, 1)) || substring(__s, 2) "
            "ELSE __s END"
        )
        return _let(cleaned, "__t", _let(truncated, "__s", uppered, "duckdb"), "duckdb")
    cleaned = _regexp_strip(_replace_chain(expr, TITLE_REPLACEMENTS), "spark")
    words = "split(__t, ' ')"
    folded = (
        f"aggregate({words}, named_struct('k', 0, 'len', 0, 'best', 0), "
        f"(acc, w) -> named_struct("
        f"'k', acc.k + 1, "
        f"'len', acc.len + octet_length(w) + IF(acc.k = 0, 0, 1), "
        f"'best', IF(acc.len + octet_length(w) + IF(acc.k = 0, 0, 1) < {TITLE_MAX}, acc.k + 1, acc.best)), "
        f"acc -> acc.best)"
    )
    truncated = (
        f"IF(octet_length(__t) < {TITLE_MAX}, __t, "
        f"concat(array_join(slice({words}, 1, {folded}), ' '), ' ...'))"
    )
    uppered = (
        "CASE WHEN ascii(__s) BETWEEN 97 AND 122 "
        "THEN concat(upper(substring(__s, 1, 1)), substring(__s, 2)) "
        "ELSE __s END"
    )
    return _let(cleaned, "__t", _let(truncated, "__s", uppered))


def wiki_title_col(expr: str) -> F.Column:
    """Column form of sql_wiki_title_full."""
    return F.expr(sql_wiki_title_full(expr))


def escape_wiki_col(col: F.Column) -> F.Column:
    """P3 as Column ops (used inside transform() lambdas where string SQL
    generation isn't convenient)."""
    out = col
    for old, new in ESCAPE_REPLACEMENTS:
        out = F.replace(out, F.lit(old), F.lit(new))
    return out


# --- plain-Python reference implementations ---------------------------------

import re as _re

_PY_CLEANUP = [_re.compile(rx) for rx in CLEANUP_REGEXES_SPARK]


def py_clean_literal(s: str) -> str:
    for rx in _PY_CLEANUP:
        s = rx.sub("", s)
    return s


def py_escape_wiki_chars(s: str) -> str:
    for old, new in ESCAPE_REPLACEMENTS:
        s = s.replace(old, new)
    return s


def py_local_name(uri: str) -> str:
    return uri.split("#")[-1].split("/")[-1]


def py_upper_first(s: str) -> str:
    if s and "a" <= s[0] <= "z":
        return s[0].upper() + s[1:]
    return s


def py_truncate_title(s: str) -> str:
    """P5: while utf-8 byte length >= 250, drop the last space-separated
    word; append ' ...' if anything was dropped. Matches Go len() (bytes)
    and strings.Split/Join semantics (a word-less string becomes '')."""
    shortened = False
    while len(s.encode("utf-8")) >= TITLE_MAX:
        bits = s.split(" ")
        s = " ".join(bits[:-1])
        shortened = True
    if shortened:
        s += " ..."
    return s


def py_wiki_title_clean(s: str) -> str:
    for old, new in TITLE_REPLACEMENTS:
        s = s.replace(old, new)
    s = py_clean_literal(s)
    s = py_truncate_title(s)
    return py_upper_first(s)


# --- pandas UDF for the slow path (long titles only) -------------------------

@F.pandas_udf(StringType())
def truncate_title_udf(titles: pd.Series) -> pd.Series:
    return titles.map(py_truncate_title)


def clean_title_col(colname: str, dialect: str = "spark") -> F.Column:
    """Spark Column: P4+P2 cleanup WITHOUT upper-first/truncation — the
    pieces callers compose with the truncation split (operators/convert.py)."""
    out = _replace_chain(colname, TITLE_REPLACEMENTS)
    out = _regexp_strip(out, dialect)
    return F.expr(out)
