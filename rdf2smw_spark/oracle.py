"""DuckDB oracle SQL builders for the KG pipeline queries.

Each builder mirrors one Spark operator/composition exactly (same
normalization chains via functions.textnorm generators, same pinned
determinism policies), parameterized on a triples subquery so the same
SQL verifies both the testdata-derived graph and the web-triplified
graph.
"""

from __future__ import annotations

from rdf2smw_spark.functions.textnorm import (
    sql_clean_literal,
    sql_local_name,
    sql_smw_type,
    sql_wiki_title_full,
)
from rdf2smw_spark.schemas import (
    CATEGORY_TYPES,
    PROPERTY_TYPES,
    SUBCLASS_PROPERTY_URI,
    TITLE_PROPERTIES,
    TYPE_PROPERTY_URI,
)

_PROP_LIST = ", ".join(f"'{p}'" for p in PROPERTY_TYPES)
_CAT_LIST = ", ".join(f"'{c}'" for c in CATEGORY_TYPES)
_TITLE_RANK = "CASE pred " + " ".join(
    f"WHEN '{p}' THEN {i + 1}" for i, p in enumerate(TITLE_PROPERTIES)
) + " END"
_TITLE_LIST = ", ".join(f"'{p}'" for p in TITLE_PROPERTIES)
_CAT_PREDS = f"'{TYPE_PROPERTY_URI}', '{SUBCLASS_PROPERTY_URI}'"

_SMW_TYPE = sql_smw_type("obj_is_iri", "obj_datatype")


def subject_types_sql(triples_sql: str) -> str:
    return f"""
    WITH triples AS {triples_sql}
    SELECT subj,
           MIN(CASE WHEN obj IN ({_PROP_LIST}) THEN 2 ELSE 3 END) AS uri_type
    FROM triples
    WHERE pred = '{TYPE_PROPERTY_URI}' AND obj IN ({_PROP_LIST}, {_CAT_LIST})
    GROUP BY subj
    """


def best_titles_sql(triples_sql: str) -> str:
    return f"""
    WITH triples AS {triples_sql}
    SELECT subj, raw_title FROM (
        SELECT subj, obj AS raw_title,
               ROW_NUMBER() OVER (PARTITION BY subj
                                  ORDER BY {_TITLE_RANK}, obj) AS rn
        FROM triples WHERE pred IN ({_TITLE_LIST})
    ) WHERE rn = 1
    """


def class_depth_sql(triples_sql: str, max_iter: int = 50) -> str:
    return f"""
    WITH RECURSIVE triples AS {triples_sql},
    edges0 AS (
        SELECT DISTINCT subj AS src, obj AS dst FROM triples
        WHERE pred IN ({_CAT_PREDS}) AND (obj_is_iri OR obj_datatype IS NULL)
    ),
    cat_nodes AS (SELECT DISTINCT dst AS node FROM edges0),
    cedges AS (SELECT e.* FROM edges0 e JOIN cat_nodes c ON e.src = c.node),
    nodes AS (SELECT src AS uri FROM cedges UNION SELECT dst FROM cedges),
    chain(start, node, len) AS (
        SELECT src, dst, 1 FROM cedges
        UNION ALL
        SELECT c.start, e.dst, c.len + 1
        FROM chain c JOIN cedges e ON e.src = c.node
        WHERE c.len < {max_iter}
    )
    SELECT n.uri, COALESCE(MAX(c.len), 0) AS depth
    FROM nodes n LEFT JOIN chain c ON c.start = n.uri
    GROUP BY n.uri
    """


def pred_smw_types_sql(triples_sql: str) -> str:
    return f"""
    WITH triples AS {triples_sql},
    obs AS (SELECT DISTINCT pred, {_SMW_TYPE} AS smw_type FROM triples)
    SELECT pred, string_agg(smw_type, ',' ORDER BY smw_type) AS has_types
    FROM obs WHERE smw_type IS NOT NULL GROUP BY pred
    """


def _titles_cte(triples_sql: str) -> str:
    """Common CTE prefix: triples, st, bt, uris, titles(uri, t)."""
    # full chain INCLUDING the P5 truncation fold — the Spark side uses
    # sql_wiki_title_full, so the oracle must too or any >=250-byte raw
    # title diverges (round-1 advice #3)
    clean = sql_wiki_title_full(
        f"COALESCE(bt.raw_title, {sql_local_name('u.uri', 'duckdb')})", "duckdb"
    )
    return f"""triples AS {triples_sql},
    st AS (
        SELECT subj, MIN(CASE WHEN obj IN ({_PROP_LIST}) THEN 2 ELSE 3 END) AS uri_type
        FROM triples
        WHERE pred = '{TYPE_PROPERTY_URI}' AND obj IN ({_PROP_LIST}, {_CAT_LIST})
        GROUP BY subj
    ),
    bt AS (
        SELECT subj, raw_title FROM (
            SELECT subj, obj AS raw_title,
                   ROW_NUMBER() OVER (PARTITION BY subj ORDER BY {_TITLE_RANK}, obj) AS rn
            FROM triples WHERE pred IN ({_TITLE_LIST})
        ) WHERE rn = 1
    ),
    uris AS (
        SELECT DISTINCT subj AS uri FROM triples
        UNION SELECT DISTINCT obj FROM triples WHERE obj_is_iri
        UNION SELECT DISTINCT pred FROM triples
    ),
    titles AS (
        SELECT u.uri, {clean} AS t
        FROM uris u LEFT JOIN bt ON bt.subj = u.uri
    ),
    page_titles AS (
        SELECT s.subj,
               CASE COALESCE(st.uri_type, 1)
                    WHEN 2 THEN 'Property:' || t.t
                    WHEN 3 THEN 'Category:' || t.t
                    ELSE t.t END AS page_title,
               COALESCE(st.uri_type, 1) AS uri_type
        FROM (SELECT DISTINCT subj FROM triples) s
        JOIN titles t ON t.uri = s.subj
        LEFT JOIN st ON st.subj = s.subj
    )"""


def wiki_titles_sql(triples_sql: str) -> str:
    return f"""
    WITH {_titles_cte(triples_sql)}
    SELECT subj, page_title, uri_type FROM page_titles
    """


def fact_rows_sql(triples_sql: str) -> str:
    lit_clean = sql_clean_literal("tr.obj", "duckdb")
    return f"""
    WITH {_titles_cte(triples_sql)},
    facts AS (
        SELECT tr.subj, pt.t AS property,
               CASE WHEN tr.obj_is_iri THEN ot.t
                    WHEN tr.obj_datatype IS NOT NULL THEN {lit_clean}
                    ELSE '' END AS value
        FROM triples tr
        JOIN titles pt ON pt.uri = tr.pred
        LEFT JOIN titles ot ON tr.obj_is_iri AND ot.uri = tr.obj
        WHERE tr.pred NOT IN ({_CAT_PREDS})
    ),
    equiv AS (SELECT DISTINCT subj, 'Equivalent URI' AS property, subj AS value FROM triples),
    subj_facts AS (SELECT * FROM facts UNION SELECT * FROM equiv),
    has_type AS (
        SELECT DISTINCT 'Property:' || pt.t AS page_title,
               'Has type' AS property, {_SMW_TYPE.replace('obj_is_iri', 'tr.obj_is_iri').replace('obj_datatype', 'tr.obj_datatype')} AS value
        FROM triples tr JOIN titles pt ON pt.uri = tr.pred
        WHERE {_SMW_TYPE.replace('obj_is_iri', 'tr.obj_is_iri').replace('obj_datatype', 'tr.obj_datatype')} IS NOT NULL
    )
    SELECT DISTINCT page_title, property, value FROM (
        SELECT pt.page_title, f.property, f.value
        FROM subj_facts f JOIN page_titles pt ON pt.subj = f.subj
        UNION ALL
        SELECT page_title, property, value FROM has_type
    )
    """


def category_rows_sql(triples_sql: str) -> str:
    lit_clean = sql_clean_literal("tr.obj", "duckdb")
    return f"""
    WITH {_titles_cte(triples_sql)},
    cats AS (
        SELECT tr.subj,
               CASE WHEN tr.obj_is_iri THEN ot.t
                    WHEN tr.obj_datatype IS NOT NULL THEN {lit_clean}
                    ELSE '' END AS category
        FROM triples tr
        LEFT JOIN titles ot ON tr.obj_is_iri AND ot.uri = tr.obj
        WHERE tr.pred IN ({_CAT_PREDS})
    )
    SELECT DISTINCT pt.page_title, c.category
    FROM cats c JOIN page_titles pt ON pt.subj = c.subj
    """


def page_stats_sql(triples_sql: str, max_iter: int = 50) -> str:
    """Non-predicate pages: title, n_facts, n_categories, specific_category.
    (Predicate pages merge with the global property index — covered by
    fact_rows; excluded here to keep both sides' logic aligned.)"""
    lit_clean = sql_clean_literal("tr.obj", "duckdb")
    return f"""
    WITH RECURSIVE {_titles_cte(triples_sql)},
    edges0 AS (
        SELECT DISTINCT subj AS src, obj AS dst FROM triples
        WHERE pred IN ({_CAT_PREDS}) AND (obj_is_iri OR obj_datatype IS NULL)
    ),
    cat_nodes AS (SELECT DISTINCT dst AS node FROM edges0),
    cedges AS (SELECT e.* FROM edges0 e JOIN cat_nodes c ON e.src = c.node),
    chain(start, node, len) AS (
        SELECT src, dst, 1 FROM cedges
        UNION ALL
        SELECT c.start, e.dst, c.len + 1
        FROM chain c JOIN cedges e ON e.src = c.node
        WHERE c.len < {max_iter}
    ),
    depth AS (SELECT start AS uri, MAX(len) AS depth FROM chain GROUP BY start),
    cats AS (
        SELECT tr.subj, tr.obj,
               CASE WHEN tr.obj_is_iri THEN ot.t
                    WHEN tr.obj_datatype IS NOT NULL THEN {lit_clean}
                    ELSE '' END AS category
        FROM triples tr
        LEFT JOIN titles ot ON tr.obj_is_iri AND ot.uri = tr.obj
        WHERE tr.pred IN ({_CAT_PREDS})
    ),
    spec AS (
        SELECT subj, category AS specific_category FROM (
            SELECT c.subj, c.category,
                   ROW_NUMBER() OVER (PARTITION BY c.subj
                                      ORDER BY d.depth DESC, c.category) AS rn
            FROM cats c JOIN depth d ON d.uri = c.obj
            WHERE d.depth > 0
        ) WHERE rn = 1
    ),
    facts AS (
        SELECT tr.subj, pt.t AS property,
               CASE WHEN tr.obj_is_iri THEN ot.t
                    WHEN tr.obj_datatype IS NOT NULL THEN {lit_clean}
                    ELSE '' END AS value
        FROM triples tr
        JOIN titles pt ON pt.uri = tr.pred
        LEFT JOIN titles ot ON tr.obj_is_iri AND ot.uri = tr.obj
        WHERE tr.pred NOT IN ({_CAT_PREDS})
    ),
    equiv AS (SELECT DISTINCT subj, 'Equivalent URI' AS property, subj AS value FROM triples),
    fact_counts AS (
        SELECT subj, COUNT(*) AS n_facts FROM (
            SELECT DISTINCT subj, property, value FROM
            (SELECT * FROM facts UNION ALL SELECT * FROM equiv)
        ) GROUP BY subj
    ),
    cat_counts AS (
        SELECT subj, COUNT(DISTINCT category) AS n_categories FROM cats GROUP BY subj
    )
    SELECT pt.page_title AS title,
           COALESCE(fc.n_facts, 0) AS n_facts,
           COALESCE(cc.n_categories, 0) AS n_categories,
           sp.specific_category
    FROM page_titles pt
    LEFT JOIN fact_counts fc ON fc.subj = pt.subj
    LEFT JOIN cat_counts cc ON cc.subj = pt.subj
    LEFT JOIN spec sp ON sp.subj = pt.subj
    WHERE pt.uri_type <> 2
    """
