"""Pure-Python simulation of the reference pipeline, used ONLY as a test
oracle for the P/R≥0.95 parity metric (BASELINE.md). Follows the exact
control flow of /root/reference/components/triplestowikipageconv.go:78-175
and mwxmlcreator.go:52-158 (arrival-order semantics, first-wins dedup,
strict-> specific-category), independently written in Python — not a code
port of the engine (our engine is the relational plan in
rdf2smw_spark/operators/).

Output: the reference's emitted fact set {(page_title, property, value)},
category set {(page_title, category)}, and page->namespace map.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from rdf2smw_spark.schemas import (  # noqa: E402
    CATEGORY_TYPES,
    DT_FLOAT,
    DT_INTEGER,
    DT_LANGSTRING,
    DT_STRING,
    PROPERTY_TYPES,
    SUBCLASS_PROPERTY_URI,
    TITLE_PROPERTIES,
    TYPE_PROPERTY_URI,
)
from rdf2smw_spark.functions.textnorm import (  # noqa: E402
    py_clean_literal,
    py_local_name,
    py_truncate_title,
    py_upper_first,
    TITLE_REPLACEMENTS,
)

UNDEFINED, PREDICATE, CLASS = 1, 2, 3
NS = {CLASS: 14, PREDICATE: 102, UNDEFINED: 0}


def _title_chars(s: str) -> str:
    for old, new in TITLE_REPLACEMENTS:
        s = s.replace(old, new)
    return s


def _find_title(triples: list[tuple]) -> str:
    # go:267-276 — outer loop over title properties (priority), inner over
    # arrival-ordered triples
    for prop in TITLE_PROPERTIES:
        for (pred, obj, is_iri, dt) in triples:
            if pred == prop:
                return obj
    return ""


def _determine_type(triples: list[tuple] | None) -> int:
    # go:177-195 — first arrival-ordered rdf:type triple matching either list
    if not triples:
        return UNDEFINED
    for (pred, obj, is_iri, dt) in triples:
        if pred == TYPE_PROPERTY_URI and obj in PROPERTY_TYPES:
            return PREDICATE
        if pred == TYPE_PROPERTY_URI and obj in CATEGORY_TYPES:
            return CLASS
    return UNDEFINED


def _convert_title(uri: str, uri_type: int, index: dict) -> tuple[str, str]:
    # go:200-265
    fact_title = ""
    if uri in index:
        fact_title = _find_title(index[uri])
    if fact_title == "":
        fact_title = py_local_name(uri)
    fact_title = _title_chars(fact_title)
    fact_title = py_clean_literal(fact_title)
    fact_title = py_truncate_title(fact_title)
    fact_title = py_upper_first(fact_title)
    if uri_type == PREDICATE:
        return "Property:" + fact_title, fact_title
    if uri_type == CLASS:
        return "Category:" + fact_title, fact_title
    return fact_title, fact_title


def _count_super(obj: str, index: dict, depth: int = 0) -> int:
    # go:278-292 (recursion; we cap at 50 — parity fixtures are acyclic)
    if depth > 50 or obj not in index:
        return 0
    top = 0
    for (pred, o2, is_iri, dt) in index[obj]:
        if pred in (TYPE_PROPERTY_URI, SUBCLASS_PROPERTY_URI):
            top = max(top, _count_super(o2, index, depth + 1) + 1)
    return top


def simulate(triples: list[tuple]) -> dict:
    """triples: arrival-ordered list of (subj, pred, obj, obj_is_iri,
    obj_datatype). Returns facts/categories/namespaces of all emitted pages."""
    index: dict[str, list[tuple]] = {}
    for (s, p, o, iri, dt) in triples:
        index.setdefault(s, []).append((p, o, iri, dt))

    pred_pages: dict[str, dict] = {}  # title -> page
    pages: list[dict] = []

    def add_fact_unique(page, prop, val):
        if (prop, val) not in page["fact_set"]:
            page["fact_set"].add((prop, val))
            page["facts"].append((prop, val))

    def ensure_pred_page(title):
        if title not in pred_pages:
            pred_pages[title] = {
                "title": title, "type": PREDICATE,
                "facts": [], "fact_set": set(), "cats": [], "specific": None,
            }
        return pred_pages[title]

    for subj, subj_triples in index.items():
        page_type = _determine_type(subj_triples)
        page_title, _ = _convert_title(subj, page_type, index)
        page = {
            "title": page_title, "type": page_type,
            "facts": [], "fact_set": set(), "cats": [], "specific": None,
        }
        top_super = 0
        for (pred, obj, is_iri, dt) in subj_triples:
            pred_title, property_str = _convert_title(pred, PREDICATE, index)
            pp = ensure_pred_page(pred_title)
            if is_iri:
                value_type = _determine_type(index.get(obj))
                _, value_str = _convert_title(obj, value_type, index)
                add_fact_unique(pp, "Has type", "Page")
            elif dt is not None:
                value_str = py_clean_literal(obj)
                if dt in (DT_STRING, DT_LANGSTRING):
                    add_fact_unique(pp, "Has type", "Text")
                elif dt in (DT_INTEGER, DT_FLOAT):
                    add_fact_unique(pp, "Has type", "Number")
            else:
                # blank node: neither TermIRI nor TermLiteral — Go's
                # valueStr stays "" and no Has-type fact is added
                # (triplestowikipageconv.go:104,113)
                value_str = ""
            if pred in (TYPE_PROPERTY_URI, SUBCLASS_PROPERTY_URI):
                if value_str not in page["cats"]:
                    page["cats"].append(value_str)
                cnt = _count_super(obj, index)
                if cnt > top_super:
                    top_super = cnt
                    page["specific"] = value_str
            else:
                add_fact_unique(page, property_str, value_str)
        add_fact_unique(page, "Equivalent URI", subj)

        if page_type == PREDICATE:
            if page["title"] in pred_pages:
                tgt = pred_pages[page["title"]]
                for f in page["facts"]:
                    add_fact_unique(tgt, *f)
                for c in page["cats"]:
                    if c not in tgt["cats"]:
                        tgt["cats"].append(c)
            else:
                pred_pages[page["title"]] = page
        else:
            pages.append(page)

    all_pages = pages + list(pred_pages.values())
    facts = {(p["title"], prop, val) for p in all_pages for (prop, val) in p["facts"]}
    cats = {(p["title"], c) for p in all_pages for c in p["cats"]}
    ns = {p["title"]: NS[p["type"]] for p in all_pages}
    return {"facts": facts, "categories": cats, "namespaces": ns}


def precision_recall(ours: set, ref: set) -> tuple[float, float]:
    if not ours and not ref:
        return 1.0, 1.0
    tp = len(ours & ref)
    p = tp / len(ours) if ours else 0.0
    r = tp / len(ref) if ref else 0.0
    return p, r
