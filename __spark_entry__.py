"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship end-to-end query — Common-Crawl-style pages →
TRIPLIFY → rdf2smw-semantics conversion → wiki-page fact rows
(the P/R-comparable triple output).

queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators; definitions in
rdf2smw_spark/queries.py with mirrored DuckDB oracles in
rdf2smw_spark/oracle.py (shared textnorm SQL generators guarantee the
two sides stay in lockstep).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from rdf2smw_spark.queries import q_web_kg_fact_rows

    return q_web_kg_fact_rows(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rdf2smw_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rdf2smw_spark.queries import ORACLES

    return dict(ORACLES)
