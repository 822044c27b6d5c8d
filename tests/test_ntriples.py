"""Parser behavior mirroring the reference's stream tests
(/root/reference/components/ttlfilereader_test.go:32-84: lexical forms
carry no serialization syntax)."""

import pytest

from rdf2smw_spark.schemas import DT_LANGSTRING, DT_STRING
from rdf2smw_spark.sources.ntriples import parse_ntriples_line, parse_ntriples_lines


def test_iri_and_literal_lexical_forms():
    t = parse_ntriples_line('<http://example.org/s1> <http://example.org/p1> "string1" .')
    assert t == ("http://example.org/s1", "http://example.org/p1", "string1", False, DT_STRING)
    t = parse_ntriples_line("<http://e/s> <http://e/p> <http://e/o> .")
    assert t == ("http://e/s", "http://e/p", "http://e/o", True, None)


def test_typed_and_lang_literals():
    t = parse_ntriples_line(
        '<http://e/s> <http://e/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .'
    )
    assert t[2] == "42" and t[4].endswith("#integer")
    t = parse_ntriples_line('<http://e/s> <http://e/p> "bonjour"@fr .')
    assert t[2] == "bonjour" and t[4] == DT_LANGSTRING


def test_escapes_and_blank_and_comments():
    t = parse_ntriples_line('<http://e/s> <http://e/p> "a\\"b\\nc\\u0041" .')
    assert t[2] == 'a"b\ncA'
    assert parse_ntriples_line("") is None
    assert parse_ntriples_line("# comment") is None
    t = parse_ntriples_line("_:b1 <http://e/p> <http://e/o> .")
    assert t[0] == "_:b1"


def test_malformed_raises():
    with pytest.raises(ValueError):
        parse_ntriples_line("<unclosed <http://e/p> <http://e/o> .")
    with pytest.raises(ValueError):
        parse_ntriples_line('<http://e/s> <http://e/p> "unterminated .')


def test_distributed_parse_quarantine(spark):
    lines = spark.createDataFrame(
        [
            ('<http://e/s1> <http://e/p1> "v1" .',),
            ("garbage line",),
            ('<http://e/s1> <http://e/p2> <http://e/o2> .',),
            ("",),
        ],
        ["value"],
    )
    parsed = parse_ntriples_lines(lines, src_url="test.nt")
    good = parsed.filter(parsed.error.isNull())
    bad = parsed.filter(parsed.error.isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    row = good.orderBy("pred").first()
    assert row["subj"] == "http://e/s1" and row["obj"] == "v1"


def test_roundtrip_property():
    """Hypothesis-style round trip: serialize arbitrary terms to N-Triples
    and parse back (SURVEY.md §5 property-based gap)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    safe_uri = st.from_regex(r"http://e\.org/[A-Za-z0-9_/#\-]{1,30}", fullmatch=True)
    literal = st.text(min_size=0, max_size=60).filter(lambda s: "\x00" not in s)

    def escape(s: str) -> str:
        return (
            s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        )

    @settings(max_examples=150, deadline=None)
    @given(safe_uri, safe_uri, literal)
    def roundtrip(s, p, o):
        line = f'<{s}> <{p}> "{escape(o)}" .'
        parsed = parse_ntriples_line(line)
        assert parsed == (s, p, o, False, DT_STRING)

    roundtrip()


def test_read_ntriples_gzip(spark, tmp_path):
    """Real dumps ship gzipped; spark.read.text decompresses by
    extension, so .nt.gz feeds the same parser with no code path
    change — pinned here so a reader refactor can't lose it."""
    import gzip

    lines = b'<http://e/s> <http://e/p> "v" .\n<http://e/s2> <http://e/p> <http://e/o> .\n'
    p = tmp_path / "in.nt.gz"
    p.write_bytes(gzip.compress(lines))
    from rdf2smw_spark.sources.ntriples import read_ntriples

    good, bad = read_ntriples(spark, str(p))
    assert good.count() == 2 and bad.count() == 0
    assert {r["subj"] for r in good.collect()} == {"http://e/s", "http://e/s2"}
