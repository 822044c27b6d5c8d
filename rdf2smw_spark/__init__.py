"""rdf2smw_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of rdfio/rdf2smw, generalized to
web-scale HTML→triple extraction.

Architecture (SURVEY.md §7): five DataFrame stages —
EXTRACT → TRIPLIFY → LINK → AGGREGATE+CONVERT → RENDER — each expressed
declaratively with pyspark.sql built-ins (Catalyst/Tungsten optimized),
dropping to vectorized pandas UDFs only where built-ins can't express the
semantics (HTML parse, N-triples decode, byte-exact title truncation).

The reference (Go, flow-based-programming over channels) is a semantic
blueprint only: its operators are re-expressed as relational transforms,
not translated.
"""

__version__ = "0.1.0"
