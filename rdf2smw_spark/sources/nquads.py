"""N-Quads source: the fourth RDF line format next to the N-Triples and
Turtle front ends (reference S1 reads Turtle via knakk/rdf, which also
ships an N-Quads decoder — rdf.NewQuadDecoder; this extends the same
S1/P1 surface to named graphs). One line per quad; the optional fourth
term is the graph IRI. Same execution shape as sources/ntriples.py:
spark.read.text line framing + an Arrow-batched mapInPandas flatMap,
same quarantine-vs-fail error policy (a bad line must not kill a
1000-executor job).

The graph term re-uses src_url's role: quads parsed from a graph-less
line inherit the file path, quads with a graph keep it — so downstream
operators (all keyed on the triple columns) are unchanged and lineage
stays per-graph.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from rdf2smw_spark.schemas import DT_LANGSTRING, DT_STRING
from rdf2smw_spark.sources.ntriples import _LIT_RE, _unescape

_NQ_LINE_RE = re.compile(
    r"^\s*(?:<([^>]*)>|(_:\S+))\s+<([^>]*)>\s+(.+?)(?:\s+<([^>]*)>)?\s*\.\s*$"
)


def parse_nquads_line(
    line: str,
) -> tuple[str, str, str, bool, str | None, str | None] | None:
    """One line -> (subj, pred, obj, obj_is_iri, obj_datatype, graph)
    or None (blank/comment) — raises ValueError on malformed content.
    graph is None for triple-form lines (N-Quads is a superset of
    N-Triples)."""
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    m = _NQ_LINE_RE.match(line)
    if not m:
        raise ValueError(f"malformed N-Quads line: {line[:120]!r}")
    subj = m.group(1) if m.group(1) is not None else m.group(2)
    pred = m.group(3)
    objtok = m.group(4)
    graph = m.group(5)
    if objtok.startswith("<") and objtok.endswith(">"):
        return (subj, pred, objtok[1:-1], True, None, graph)
    if objtok.startswith("_:"):
        # blank-node object: same encoding contract as ntriples.py
        return (subj, pred, objtok, False, None, graph)
    lm = _LIT_RE.match(objtok)
    if not lm:
        raise ValueError(f"malformed object term: {objtok[:120]!r}")
    value = _unescape(lm.group(1))
    dt = lm.group(2)
    lang = lm.group(3)
    if lang is not None:
        return (subj, pred, value, False, DT_LANGSTRING, graph)
    return (subj, pred, value, False, dt if dt is not None else DT_STRING, graph)


PARSED_NQ_SCHEMA = (
    "subj string, pred string, obj string, obj_is_iri boolean, "
    "obj_datatype string, src_url string, error string"
)


def parse_nquads_lines(lines: DataFrame, src_url: str | None = None) -> DataFrame:
    """DataFrame[value: string] -> quad DataFrame; the graph term lands
    in src_url (falling back to the per-row/constant source when the
    line has no graph). Malformed lines carry non-null `error`."""
    per_row_src = "src_url" in lines.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple] = []
            srcs = pdf["src_url"] if per_row_src else [src_url] * len(pdf)
            for line, src in zip(pdf["value"], srcs):
                try:
                    t = parse_nquads_line(line)
                except ValueError as exc:
                    out.append((None, None, None, None, None, src, str(exc)))
                    continue
                if t is not None:
                    *terms, graph = t
                    out.append((*terms, graph if graph is not None else src, None))
            yield pd.DataFrame(
                out,
                columns=[
                    "subj", "pred", "obj", "obj_is_iri", "obj_datatype",
                    "src_url", "error",
                ],
            )

    return lines.mapInPandas(batches, schema=PARSED_NQ_SCHEMA)


def read_nquads(
    spark: SparkSession, path: str, on_error: str = "quarantine"
) -> tuple[DataFrame, DataFrame]:
    """Read .nq file(s) -> (quads, quarantine); on_error='fail' raises
    on the first malformed line (reference error policy)."""
    parsed = parse_nquads_lines(spark.read.text(path), src_url=path)
    bad = parsed.filter(parsed.error.isNotNull()).select("error", "src_url")
    good = parsed.filter(parsed.error.isNull()).drop("error")
    if on_error == "fail":
        first = bad.take(1)
        if first:
            raise ValueError(first[0]["error"])
    return good, bad


_ESC_TABLE = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _nq_term(obj: str, is_iri: bool, dt: str | None) -> str:
    if is_iri:
        return f"<{obj}>"
    if dt is None:
        return obj  # blank node label
    quoted = '"' + "".join(_ESC_TABLE.get(c, c) for c in obj) + '"'
    if dt == DT_STRING:
        return quoted
    if dt == DT_LANGSTRING:
        return quoted + "@en"  # lang collapses to rdf:langString on parse
    return quoted + f"^^<{dt}>"


def quads_to_nquads(rows: list[tuple]) -> str:
    """Serialize (subj, pred, obj, obj_is_iri, obj_datatype, graph)
    rows to N-Quads text. Deterministic: input order preserved, one
    line per quad, so parse(serialize(Q)) == Q as a multiset."""
    lines = []
    for (subj, pred, obj, is_iri, dt, graph) in rows:
        s = subj if subj.startswith("_:") else f"<{subj}>"
        g = f" <{graph}>" if graph else ""
        lines.append(f"{s} <{pred}> {_nq_term(obj, is_iri, dt)}{g} .")
    return "\n".join(lines) + "\n"
