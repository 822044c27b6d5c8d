"""Deterministic triple derivation from the driver's TPC-H-ish testdata.

Maps the star schema onto an RDF graph exercising every reference
behavior: class hierarchy (customer --type--> nation --subClassOf-->
region, both owl:Class), property declarations (owl:*Property), typed
literals (xsd:string / xsd:float / rdf:langString), title properties
(rdfs:label with local-name fallback), and nasty strings for the char
cleanup tables.

Two mirrored implementations: `testdata_triples(spark, sf_dir)` (DataFrame,
pure built-ins, no UDFs) and `duckdb_triples_sql()` (the oracle CTE). A
unit test plus the driver's sf0.01 gate verify they agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf2smw_spark.schemas import (
    CATEGORY_TYPES,
    DT_FLOAT,
    DT_LANGSTRING,
    DT_STRING,
    SUBCLASS_PROPERTY_URI,
    TRIPLE_SCHEMA,
    TYPE_PROPERTY_URI,
)

ONT = "http://example.org/onto#"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
OWL_CLASS = CATEGORY_TYPES[0]
OWL_DATATYPE_PROP = "http://www.w3.org/2002/07/owl#DatatypeProperty"
OWL_OBJECT_PROP = "http://www.w3.org/2002/07/owl#ObjectProperty"
OWL_ANNOTATION_PROP = "http://www.w3.org/2002/07/owl#AnnotationProperty"

CUST = "http://example.org/customer/"
NATION = "http://example.org/nation/"
REGION = "http://example.org/region/"
SEGMENT = "http://example.org/segment/"
ORDER = "http://example.org/order/"
ORDER_CLASS = "http://example.org/class/Order"

# Static declaration triples (subj, pred, obj, obj_is_iri, obj_datatype, src).
# The two P2-bait labels carry ' (ns:q)' / ' [ns:q]' qualifiers.
STATIC_TRIPLES: list[tuple[str, str, str, bool, str | None, str]] = [
    (ORDER_CLASS, TYPE_PROPERTY_URI, OWL_CLASS, True, None, "testdata://static"),
    (ORDER_CLASS, RDFS_LABEL, "Order record (tpch:orders)", False, DT_STRING, "testdata://static"),
    (ONT + "name", TYPE_PROPERTY_URI, OWL_DATATYPE_PROP, True, None, "testdata://static"),
    (ONT + "name", RDFS_LABEL, "customer name", False, DT_STRING, "testdata://static"),
    (ONT + "acctbal", TYPE_PROPERTY_URI, OWL_DATATYPE_PROP, True, None, "testdata://static"),
    (ONT + "priority", TYPE_PROPERTY_URI, OWL_ANNOTATION_PROP, True, None, "testdata://static"),
    (ONT + "totalprice", TYPE_PROPERTY_URI, OWL_DATATYPE_PROP, True, None, "testdata://static"),
    (ONT + "customer", TYPE_PROPERTY_URI, OWL_OBJECT_PROP, True, None, "testdata://static"),
    (ONT + "customer", RDFS_LABEL, "customer [tpch:c_custkey]", False, DT_STRING, "testdata://static"),
    (ONT + "orderdate", TYPE_PROPERTY_URI, OWL_DATATYPE_PROP, True, None, "testdata://static"),
    ("http://example.org/thing/weird", RDFS_LABEL, "A|B=C<D>E,F.G?H&I#J", False, DT_STRING, "testdata://static"),
    ("http://example.org/thing/weird", ONT + "name", "x (foo:bar) y", False, DT_STRING, "testdata://static"),
    # P5 bait: a >=250-byte label so the title-truncation fold is exercised
    # by the oracle comparison on BOTH sides (round-1 advice #3) — 40
    # words x 7 bytes = 279 bytes, truncates to the longest <250-byte
    # word prefix + ' ...'.
    (
        "http://example.org/thing/verbose",
        RDFS_LABEL,
        " ".join(f"word{i:02d}" for i in range(40)),
        False,
        DT_STRING,
        "testdata://static",
    ),
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from rdf2smw_spark.session import read_parquet_cached_schema

    return read_parquet_cached_schema(spark, f"{sf_dir}/{name}.parquet")


def _t(subj, pred, obj, is_iri, datatype, src) -> list:
    """Column list in TRIPLE_SCHEMA order."""
    return [
        subj.alias("subj"),
        (pred if not isinstance(pred, str) else F.lit(pred)).alias("pred"),
        obj.alias("obj"),
        F.lit(is_iri).alias("obj_is_iri"),
        (F.lit(datatype).cast("string")).alias("obj_datatype"),
        F.lit(src).alias("src_url"),
    ]


# Memo of the CONSTRUCTED logical plan per (application, sf_dir): building
# the 16-part union costs ~1s of py4j expression construction per call
# (measured), repeated by every KG query. A DataFrame is an immutable
# plan — reusing it caches no rows and skips no computation (each action
# re-scans parquet; bench draws clearCache() between runs). Callers that
# persist the shared object release via release_scoped_caches(), which
# only ever costs recomputation.
_TRIPLES_PLAN: dict[tuple[str, str], DataFrame] = {}


def testdata_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _TRIPLES_PLAN.get(key)
    if cached is None:
        cached = _build_testdata_triples(spark, sf_dir)
        _TRIPLES_PLAN[key] = cached
    return cached


def _build_testdata_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the triple table. Pure projections + unions: Catalyst prunes
    each parquet scan to the referenced columns and there is no shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")

    cust_uri = F.concat(F.lit(CUST), F.col("c_custkey"))
    nation_uri_c = F.concat(F.lit(NATION), F.col("c_nationkey"))
    seg_uri_c = F.concat(F.lit(SEGMENT), F.col("c_mktsegment"))
    src_c = "testdata://customer"

    parts = [
        cust.select(*_t(cust_uri, TYPE_PROPERTY_URI, nation_uri_c, True, None, src_c)),
        cust.select(*_t(cust_uri, TYPE_PROPERTY_URI, seg_uri_c, True, None, src_c)),
        cust.select(*_t(cust_uri, ONT + "name", F.col("c_name"), False, DT_STRING, src_c)),
        cust.select(
            *_t(cust_uri, ONT + "acctbal", F.format_string("%.2f", F.col("c_acctbal")), False, DT_FLOAT, src_c)
        ),
        cust.filter(F.col("c_custkey") % 3 == 0).select(
            *_t(cust_uri, RDFS_LABEL, F.col("c_name"), False, DT_LANGSTRING, src_c)
        ),
    ]

    nation_uri = F.concat(F.lit(NATION), F.col("n_nationkey"))
    region_uri_n = F.concat(F.lit(REGION), F.col("n_regionkey"))
    src_n = "testdata://nation"
    parts += [
        nation.select(*_t(nation_uri, TYPE_PROPERTY_URI, F.lit(OWL_CLASS), True, None, src_n)),
        nation.select(*_t(nation_uri, SUBCLASS_PROPERTY_URI, region_uri_n, True, None, src_n)),
        nation.select(*_t(nation_uri, RDFS_LABEL, F.col("n_name"), False, DT_STRING, src_n)),
    ]

    region_uri = F.concat(F.lit(REGION), F.col("r_regionkey"))
    src_r = "testdata://region"
    parts += [
        region.select(*_t(region_uri, TYPE_PROPERTY_URI, F.lit(OWL_CLASS), True, None, src_r)),
        region.select(*_t(region_uri, RDFS_LABEL, F.col("r_name"), False, DT_STRING, src_r)),
    ]

    seg = cust.select(F.col("c_mktsegment").alias("seg")).distinct()
    seg_uri = F.concat(F.lit(SEGMENT), F.col("seg"))
    src_s = "testdata://segment"
    parts += [
        seg.select(*_t(seg_uri, TYPE_PROPERTY_URI, F.lit(OWL_CLASS), True, None, src_s)),
        seg.select(*_t(seg_uri, RDFS_LABEL, F.col("seg"), False, DT_STRING, src_s)),
    ]

    order_uri = F.concat(F.lit(ORDER), F.col("o_orderkey"))
    cust_uri_o = F.concat(F.lit(CUST), F.col("o_custkey"))
    src_o = "testdata://orders"
    parts += [
        orders.select(*_t(order_uri, TYPE_PROPERTY_URI, F.lit(ORDER_CLASS), True, None, src_o)),
        orders.select(*_t(order_uri, ONT + "customer", cust_uri_o, True, None, src_o)),
        orders.select(*_t(order_uri, ONT + "orderstatus", F.col("o_orderstatus"), False, DT_STRING, src_o)),
        orders.select(
            *_t(order_uri, ONT + "totalprice", F.format_string("%.2f", F.col("o_totalprice")), False, DT_FLOAT, src_o)
        ),
        orders.select(
            *_t(order_uri, ONT + "orderdate", F.date_format(F.col("o_orderdate"), "yyyy-MM-dd"), False, DT_STRING, src_o)
        ),
        orders.select(*_t(order_uri, ONT + "priority", F.col("o_orderpriority"), False, DT_STRING, src_o)),
    ]

    from rdf2smw_spark.session import small_local_df

    static = small_local_df(spark, STATIC_TRIPLES, TRIPLE_SCHEMA)
    parts.append(static)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def duckdb_triples_sql() -> str:
    """The same derivation as ANSI SQL for DuckDB (tables pre-registered as
    views). Returns a parenthesized subquery usable as `WITH triples AS ...`."""
    statics = ",\n      ".join(
        "({}, {}, {}, {}, {}, {})".format(
            _q(s), _q(p), _q(o), "true" if i else "false",
            _q(d) if d is not None else "CAST(NULL AS VARCHAR)", _q(src),
        )
        for (s, p, o, i, d, src) in STATIC_TRIPLES
    )
    return f"""(
    SELECT 'http://example.org/customer/' || c_custkey AS subj,
           '{TYPE_PROPERTY_URI}' AS pred,
           'http://example.org/nation/' || c_nationkey AS obj,
           true AS obj_is_iri, CAST(NULL AS VARCHAR) AS obj_datatype,
           'testdata://customer' AS src_url
    FROM customer
    UNION ALL
    SELECT 'http://example.org/customer/' || c_custkey, '{TYPE_PROPERTY_URI}',
           'http://example.org/segment/' || c_mktsegment, true, NULL, 'testdata://customer'
    FROM customer
    UNION ALL
    SELECT 'http://example.org/customer/' || c_custkey, '{ONT}name', c_name,
           false, '{DT_STRING}', 'testdata://customer'
    FROM customer
    UNION ALL
    SELECT 'http://example.org/customer/' || c_custkey, '{ONT}acctbal',
           printf('%.2f', c_acctbal), false, '{DT_FLOAT}', 'testdata://customer'
    FROM customer
    UNION ALL
    SELECT 'http://example.org/customer/' || c_custkey, '{RDFS_LABEL}', c_name,
           false, '{DT_LANGSTRING}', 'testdata://customer'
    FROM customer WHERE (c_custkey % 3) = 0
    UNION ALL
    SELECT 'http://example.org/nation/' || n_nationkey, '{TYPE_PROPERTY_URI}',
           '{OWL_CLASS}', true, NULL, 'testdata://nation'
    FROM nation
    UNION ALL
    SELECT 'http://example.org/nation/' || n_nationkey, '{SUBCLASS_PROPERTY_URI}',
           'http://example.org/region/' || n_regionkey, true, NULL, 'testdata://nation'
    FROM nation
    UNION ALL
    SELECT 'http://example.org/nation/' || n_nationkey, '{RDFS_LABEL}', n_name,
           false, '{DT_STRING}', 'testdata://nation'
    FROM nation
    UNION ALL
    SELECT 'http://example.org/region/' || r_regionkey, '{TYPE_PROPERTY_URI}',
           '{OWL_CLASS}', true, NULL, 'testdata://region'
    FROM region
    UNION ALL
    SELECT 'http://example.org/region/' || r_regionkey, '{RDFS_LABEL}', r_name,
           false, '{DT_STRING}', 'testdata://region'
    FROM region
    UNION ALL
    SELECT 'http://example.org/segment/' || seg, '{TYPE_PROPERTY_URI}',
           '{OWL_CLASS}', true, NULL, 'testdata://segment'
    FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer)
    UNION ALL
    SELECT 'http://example.org/segment/' || seg, '{RDFS_LABEL}', seg,
           false, '{DT_STRING}', 'testdata://segment'
    FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer)
    UNION ALL
    SELECT 'http://example.org/order/' || o_orderkey, '{TYPE_PROPERTY_URI}',
           '{ORDER_CLASS}', true, NULL, 'testdata://orders'
    FROM orders
    UNION ALL
    SELECT 'http://example.org/order/' || o_orderkey, '{ONT}customer',
           'http://example.org/customer/' || o_custkey, true, NULL, 'testdata://orders'
    FROM orders
    UNION ALL
    SELECT 'http://example.org/order/' || o_orderkey, '{ONT}orderstatus',
           o_orderstatus, false, '{DT_STRING}', 'testdata://orders'
    FROM orders
    UNION ALL
    SELECT 'http://example.org/order/' || o_orderkey, '{ONT}totalprice',
           printf('%.2f', o_totalprice), false, '{DT_FLOAT}', 'testdata://orders'
    FROM orders
    UNION ALL
    SELECT 'http://example.org/order/' || o_orderkey, '{ONT}orderdate',
           strftime(o_orderdate, '%Y-%m-%d'), false, '{DT_STRING}', 'testdata://orders'
    FROM orders
    UNION ALL
    SELECT 'http://example.org/order/' || o_orderkey, '{ONT}priority',
           o_orderpriority, false, '{DT_STRING}', 'testdata://orders'
    FROM orders
    UNION ALL
    SELECT * FROM (VALUES
      {statics}
    ) AS st(subj, pred, obj, obj_is_iri, obj_datatype, src_url)
)"""


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"
