"""CLI + category filter."""

import json

from rdf2smw_spark.operators.filters import filter_pages_by_category
from rdf2smw_spark.schemas import URI_TYPE_UNDEFINED, WIKI_PAGE_SCHEMA


def test_category_filter(spark):
    pages = spark.createDataFrame(
        [
            ("A", URI_TYPE_UNDEFINED, [], ["Keep", "Other"], None),
            ("B", URI_TYPE_UNDEFINED, [], ["Other"], None),
            ("C", URI_TYPE_UNDEFINED, [], [], None),
        ],
        WIKI_PAGE_SCHEMA,
    )
    out = {r["title"] for r in filter_pages_by_category(pages, ["Keep"]).collect()}
    assert out == {"A"}


def test_cli_nt_mode(spark, tmp_path, capsys):
    from rdf2smw_spark.__main__ import main

    nt = tmp_path / "in.nt"
    nt.write_text('<http://e/s> <http://e/p> "v" .\n')
    rc = main(["--in", str(nt), "--out", str(tmp_path / "out")])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["bad_lines"] == 0
    assert (tmp_path / "out" / "pages.xml").exists()
    assert "<mediawiki>" in (tmp_path / "out" / "pages.xml").read_text()
