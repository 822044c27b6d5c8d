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
        -- explicit outer DISTINCT: under WITH RECURSIVE DuckDB stops
        -- deduplicating this UNION across branches (observed 1.x quirk;
        -- page_stats_sql masked it via its uri_type filter)
        SELECT DISTINCT uri FROM (
            SELECT subj AS uri FROM triples
            UNION ALL SELECT obj FROM triples WHERE obj_is_iri
            UNION ALL SELECT pred FROM triples
        )
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


def pages_xml_sql(triples_sql: str, max_iter: int = 50) -> str:
    """Full render oracle for kg_pages_xml: (title, page_type, xml) for
    content, property AND template pages, mirroring operators/render.py
    byte-for-byte — pinned timestamp, sorted fact order with the
    Equivalent-URI fact appended last, 'Has type' facts first on merged
    property pages, run-length collapse of adjacent same-property facts
    (LAG over the final order), and the exact WIKI_XML_TPL segments
    (imported, not retyped, so the byte template has one source of
    truth)."""
    from rdf2smw_spark.functions.textnorm import sql_escape_wiki_chars
    from rdf2smw_spark.operators.render import FIXED_TIMESTAMP, WIKI_XML_TPL

    def lit(s):
        body = (
            s.replace("\\", "\\\\")
            .replace("'", "''")
            .replace("\n", "\\n")
            .replace("\t", "\\t")
        )
        return "e'" + body + "'"

    # split the %s/%d template around (title, ns, timestamp, wikitext)
    seg_a, rest = WIKI_XML_TPL.split("%s", 1)
    seg_b, rest = rest.split("%d", 1)
    seg_c, rest = rest.split("%s", 1)
    seg_d, seg_e = rest.split("%s", 1)
    seg_c = seg_c + FIXED_TIMESTAMP + seg_d  # bake the pinned timestamp

    def xml_expr(title, ns, text):
        return (
            lit(seg_a) + " || " + title + " || " + lit(seg_b) + " || " + ns
            + " || " + lit(seg_c) + " || " + text + " || " + lit(seg_e)
        )

    lit_clean = sql_clean_literal("tr.obj", "duckdb")
    esc_v = sql_escape_wiki_chars("value", "duckdb")
    smw = _SMW_TYPE.replace("obj_is_iri", "tr.obj_is_iri").replace(
        "obj_datatype", "tr.obj_datatype"
    )
    nl = "chr(10)"
    ns_case = "CASE page_type WHEN 3 THEN '14' WHEN 2 THEN '102' WHEN 4 THEN '10' ELSE '0' END"

    tpl_wikitext = (
        lit("{{") + " || tpl_name || " + nl + " || COALESCE(r.tpl_body, '') || "
        + lit("|Categories=") + " || cats_joined || " + nl + " || " + lit("}}")
    )
    prop_row = (
        lit("|-\n!") + " || property || " + lit("\n|{{#arraymap:{{{")
        + " || replace(property, ' ', '_') || " + lit("|}}}|,|x|[[")
        + " || property || " + lit("::x]]|,}}\n")
    )
    tpl_body = (
        lit('{|class="wikitable smwtable"\n!colspan="2"| ')
        + " || template_name || " + lit(": {{PAGENAMEE}}\n")
        + " || prop_rows || " + lit("|}\n\n{{#arraymap:{{{Categories}}}|,|x|[[Category:x]]|}}\n")
    )

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
    catsd AS (SELECT DISTINCT subj, category FROM cats),
    spec AS (
        SELECT subj, category AS specific_category FROM (
            SELECT c.subj, c.category,
                   ROW_NUMBER() OVER (PARTITION BY c.subj
                                      ORDER BY d.depth DESC, c.category) AS rn
            FROM cats c JOIN depth d ON d.uri = c.obj
            WHERE d.depth > 0
        ) WHERE rn = 1
    ),
    pagecats AS (
        SELECT subj, COUNT(*) AS n_cats,
               string_agg(category, ',' ORDER BY category) AS cats_joined,
               MAX(category) AS last_cat
        FROM catsd GROUP BY subj
    ),
    rfacts AS (
        SELECT DISTINCT tr.subj, pt.t AS property,
               CASE WHEN tr.obj_is_iri THEN ot.t
                    WHEN tr.obj_datatype IS NOT NULL THEN {lit_clean}
                    ELSE '' END AS value
        FROM triples tr
        JOIN titles pt ON pt.uri = tr.pred
        LEFT JOIN titles ot ON tr.obj_is_iri AND ot.uri = tr.obj
        WHERE tr.pred NOT IN ({_CAT_PREDS})
    ),
    equiv AS (
        SELECT DISTINCT t.subj, 'Equivalent URI' AS property, t.subj AS value
        FROM triples t
        WHERE NOT EXISTS (SELECT 1 FROM rfacts r
                          WHERE r.subj = t.subj
                            AND r.property = 'Equivalent URI' AND r.value = t.subj)
    ),
    sfacts AS (
        SELECT subj, 1 AS blk, property, value FROM rfacts
        UNION ALL
        SELECT subj, 2, property, value FROM equiv
    ),
    cpages AS (
        SELECT 'c:' || pt.subj AS key, pt.page_title AS title,
               pt.uri_type AS page_type, pt.subj
        FROM page_titles pt WHERE pt.uri_type <> 2
    ),
    pred_t AS (
        SELECT DISTINCT 'Property:' || t.t AS title
        FROM (SELECT DISTINCT pred FROM triples) p JOIN titles t ON t.uri = p.pred
    ),
    ht AS (
        SELECT DISTINCT 'Property:' || t.t AS title, {smw} AS value
        FROM triples tr JOIN titles t ON t.uri = tr.pred
        WHERE {smw} IS NOT NULL
    ),
    sp AS (
        SELECT pt.page_title AS title, pt.subj
        FROM page_titles pt WHERE pt.uri_type = 2
    ),
    ppages AS (
        SELECT 'p:' || COALESCE(pr.title, sp.title) || '|' || COALESCE(sp.subj, '') AS key,
               COALESCE(pr.title, sp.title) AS title, 2 AS page_type, sp.subj
        FROM pred_t pr FULL OUTER JOIN sp ON sp.title = pr.title
    ),
    ufacts AS (
        SELECT cp.key, sf.blk, sf.property, sf.value
        FROM cpages cp JOIN sfacts sf ON sf.subj = cp.subj
        UNION ALL
        SELECT pp.key, 0 AS blk, 'Has type' AS property, h.value
        FROM ppages pp JOIN ht h ON h.title = pp.title
        UNION ALL
        SELECT pp.key, sf.blk, sf.property, sf.value
        FROM ppages pp JOIN sfacts sf ON sf.subj = pp.subj
        WHERE NOT (sf.property = 'Has type' AND EXISTS (
            SELECT 1 FROM ht h WHERE h.title = pp.title AND h.value = sf.value))
    ),
    upages AS (
        SELECT cp.key, cp.title, cp.page_type,
               COALESCE(pc.n_cats, 0) AS n_cats,
               COALESCE(pc.cats_joined, '') AS cats_joined,
               COALESCE(s.specific_category, pc.last_cat) AS tpl_name
        FROM cpages cp
        LEFT JOIN pagecats pc ON pc.subj = cp.subj
        LEFT JOIN spec s ON s.subj = cp.subj
        UNION ALL
        SELECT pp.key, pp.title, pp.page_type,
               COALESCE(pc.n_cats, 0),
               COALESCE(pc.cats_joined, ''),
               COALESCE(s.specific_category, pc.last_cat)
        FROM ppages pp
        LEFT JOIN pagecats pc ON pc.subj = pp.subj
        LEFT JOIN spec s ON s.subj = pp.subj
    ),
    entries AS (
        SELECT key, blk, property, value,
               LAG(property) OVER (PARTITION BY key ORDER BY blk, property, value) AS prev_p
        FROM ufacts
    ),
    rendered_body AS (
        SELECT key,
               string_agg(CASE WHEN prev_p = property
                               THEN ',' || {esc_v} || {nl}
                               ELSE '|' || replace(property, ' ', '_') || '=' || {esc_v} || {nl} END,
                          '' ORDER BY blk, property, value) AS tpl_body,
               string_agg('[[' || property || '::' || {esc_v} || ']]' || {nl},
                          '' ORDER BY blk, property, value) AS plain_body
        FROM entries GROUP BY key
    ),
    wt AS (
        SELECT u.key, u.title, u.page_type,
               CASE WHEN u.n_cats > 0 THEN {tpl_wikitext}
                    ELSE COALESCE(r.plain_body, '') END AS wikitext,
               CASE WHEN u.n_cats > 0 THEN u.tpl_name END AS template_name
        FROM upages u LEFT JOIN rendered_body r ON r.key = u.key
    ),
    tprops AS (
        SELECT DISTINCT w.template_name, f.property
        FROM wt w JOIN ufacts f ON f.key = w.key
        WHERE w.template_name IS NOT NULL
    ),
    tbodies AS (
        SELECT template_name,
               string_agg({prop_row}, '' ORDER BY property) AS prop_rows
        FROM tprops GROUP BY template_name
    )
    SELECT title, page_type, {xml_expr('title', ns_case, 'wikitext')} AS xml FROM wt
    UNION ALL
    SELECT 'Template:' || template_name AS title, 4 AS page_type,
           {xml_expr("'Template:' || template_name", "'10'", '(' + tpl_body + ')')} AS xml
    FROM tbodies
    """
