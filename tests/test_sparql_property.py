"""Property-based checks for the SPARQL front end.

1. Total parser: ANY input string either parses or raises
   SparqlSyntaxError — never IndexError/KeyError/RecursionError (a
   query service's parser is attacker-facing).
2. Closure oracle-by-construction: on random small edge sets, the
   distributed `p+` fixpoint equals a driver-computed transitive
   closure, and `p*` equals it plus the zero-length identity over all
   graph terms.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rdf2smw_spark.schemas import TRIPLE_SCHEMA
from rdf2smw_spark.sparql import SparqlSyntaxError, parse_sparql, sparql_select

EX = "http://ex.org/"
PRE = "PREFIX ex: <http://ex.org/>\n"


# -- 1: the parser is total ----------------------------------------------------

_fragments = st.sampled_from([
    "SELECT", "WHERE", "{", "}", "(", ")", "?x", "?y", "<http://a>",
    "ex:p", '"lit"', "FILTER", "OPTIONAL", "UNION", "MINUS", "GRAPH",
    "a", ".", ";", ",", "|", "/", "^", "+", "*", "COUNT", "AS",
    "GROUP", "BY", "ORDER", "LIMIT", "5", "&&", "=", "!", "PREFIX",
    "VALUES", "UNDEF", "BIND", "ASK", "DESCRIBE", "CONSTRUCT",
])


@settings(max_examples=300, deadline=None)
@given(st.lists(_fragments, max_size=12).map(" ".join))
def test_parser_is_total_on_fragment_soup(text):
    try:
        parse_sparql(text)
    except SparqlSyntaxError:
        pass  # the only acceptable failure mode


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_parser_is_total_on_arbitrary_text(text):
    try:
        parse_sparql(text)
    except SparqlSyntaxError:
        pass


# -- 2: distributed closure == driver closure ---------------------------------

@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1, max_size=14, unique=True,
    )
)
def test_path_plus_matches_driver_closure(spark, edges):
    rows = [
        (f"{EX}n{a}", EX + "p", f"{EX}n{b}", True, None, "t://g")
        for a, b in edges
    ]
    t = spark.createDataFrame(rows, TRIPLE_SCHEMA)

    # driver-side transitive closure (Floyd-Warshall on ≤8 nodes)
    reach = set(edges)
    changed = True
    while changed:
        changed = False
        for (a, b) in list(reach):
            for (c, d) in list(reach):
                if b == c and (a, d) not in reach:
                    reach.add((a, d))
                    changed = True

    got = {
        (r["s"], r["o"])
        for r in sparql_select(
            t, PRE + "SELECT ?s ?o WHERE { ?s ex:p+ ?o . }"
        ).collect()
    }
    want = {(f"{EX}n{a}", f"{EX}n{b}") for a, b in reach}
    assert got == want

    # p* adds exactly the zero-length identity over every graph term
    got_star = {
        (r["s"], r["o"])
        for r in sparql_select(
            t, PRE + "SELECT ?s ?o WHERE { ?s ex:p* ?o . }"
        ).collect()
    }
    terms = {f"{EX}n{a}" for a, b in edges} | {f"{EX}n{b}" for a, b in edges}
    assert got_star == want | {(x, x) for x in terms}
