"""N-Triples sink: serialization contract vs a pure-Python parser twin."""

from __future__ import annotations

import re

from ontology_mapping_spark.sources.rdf import (
    DEFAULT_PREFIXES,
    IRI_SANITIZE,
    ntriples_lines,
    write_ntriples,
)

# ---------------------------------------------------------------- twin parser

_IRI = re.compile(r"^<([^>]*)>$")
_UNESCAPE = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t"}


def parse_term(tok: str):
    m = _IRI.match(tok)
    if m:
        return ("iri", m.group(1))
    assert tok.startswith('"') and tok.endswith('"'), tok
    body = tok[1:-1]
    out, i = [], 0
    while i < len(body):
        if body[i] == "\\":
            out.append(_UNESCAPE[body[i : i + 2]])
            i += 2
        else:
            assert body[i] != '"', tok  # unescaped quote inside literal
            out.append(body[i])
            i += 1
    return ("lit", "".join(out))


def parse_line(line: str):
    assert line.endswith(" ."), line
    # terms never contain spaces: IRIs are sanitized, literal escapes keep
    # \n/\t encoded... but literals CAN contain plain spaces, so split
    # subject/predicate first (no spaces) and treat the rest as object
    s, p, rest = line[:-2].split(" ", 2)
    return parse_term(s), parse_term(p), parse_term(rest)


def _sanitize(s: str) -> str:
    # generated from the sink's own table — no hand-copied mirror
    for ch, enc in IRI_SANITIZE:
        s = s.replace(ch, enc)
    return s


def expand(term: str) -> tuple[str, str]:
    if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://", term):
        return ("iri", _sanitize(term))
    for p, ns in DEFAULT_PREFIXES.items():
        if term.startswith(p + ":"):
            return ("iri", _sanitize(ns + term[len(p) + 1 :]))
    return ("lit", term)


ROWS = [
    ("src:C0001", "kg:isA", "tgt:C0002"),
    ("uri:42", "kg:mentionedIn", "https://example.org/p?q=a b"),  # IRI sanitize
    ("src:C0001", "kg:label", 'say "hi"\nnew\tline\\done'),  # literal escapes
    ("https://a.org/x", "http://purl.org/dc/terms/relation", "plain words"),
    ("src:C0003", "kg:label", ""),  # empty literal
]


def test_ntriples_round_trip(spark):
    df = spark.createDataFrame(ROWS, "subject string, predicate string, object string")
    lines = [r["line"] for r in ntriples_lines(df).collect()]
    parsed = sorted(parse_line(ln) for ln in lines)
    want = sorted((expand(s), expand(p), expand(o)) for s, p, o in ROWS)
    assert parsed == want


def test_ntriples_text_write(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "subject string, predicate string, object string")
    out = str(tmp_path / "kg_nt")
    write_ntriples(df, out)
    back = [r["value"] for r in spark.read.text(out).collect()]
    assert sorted(back) == sorted(r["line"] for r in ntriples_lines(df).collect())
    # every line parses cleanly
    for ln in back:
        parse_line(ln)


def test_random_literals_round_trip(spark):
    """200 seeded-random tricky literals (quotes, backslashes, control
    chars, unicode, prefix-lookalikes) in one Spark job — every line must
    parse back to the exact input term."""
    import random

    rng = random.Random(20260818)
    alphabet = list('abc "\\\n\r\t<>:/.%μδ€') + ["kg:", "src:", "https://"]
    rows = []
    for i in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        rows.append((f"src:T{i}", "kg:label", s))
    df = spark.createDataFrame(rows, "subject string, predicate string, object string")
    lines = [r["line"] for r in ntriples_lines(df).collect()]
    parsed = sorted(parse_line(ln) for ln in lines)
    want = sorted((expand(s), expand(p), expand(o)) for s, p, o in rows)
    assert parsed == want


def test_pipeline_triples_serialize(spark, tmp_path):
    # the actual kg_triples schema (subject, predicate, object) feeds the
    # sink unchanged; spot-check a mention triple's shape
    df = spark.createDataFrame(
        [("src:C0007", "kg:mentionedIn", "https://example.org/p/00000001")],
        "subject string, predicate string, object string",
    )
    [line] = [r["line"] for r in ntriples_lines(df).collect()]
    assert line == (
        "<http://example.org/src/C0007> <http://example.org/kg#mentionedIn> "
        "<https://example.org/p/00000001> ."
    )


def test_read_ntriples_inverts_write(spark, tmp_path):
    """Distributed reader round-trip: write_ntriples -> read_ntriples
    returns the exact triple set, including re-compacted prefix terms,
    absolute IRIs, and escaped literals (the same adversarial alphabet
    as the pure-Python parser twin)."""
    import random

    from ontology_mapping_spark.sources.rdf import read_ntriples, write_ntriples

    rng = random.Random(20260819)
    alphabet = list('abc "\\\n\r\t<>:/.%μδ€') + ["kg:", "src:", "https://"]
    rows = []
    for i in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        rows.append((f"src:T{i}", "kg:label", s))
    rows.append(("src:C0007", "kg:mentionedIn", "https://e.org/p/1"))
    df = spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )
    path = str(tmp_path / "kg_nt")
    write_ntriples(df, path)
    back = read_ntriples(spark, path)
    got = sorted(tuple(r) for r in back.collect())
    # every term round-trips verbatim: IRIs (prefix-form / absolute)
    # re-compact to the input spelling, literals through the escapes
    assert got == sorted(rows)


def test_read_ntriples_nested_prefixes_compact_longest(spark, tmp_path):
    """A prefix map with one namespace nested inside another must
    re-compact against the LONGEST namespace (the when-chain order bug
    this pins: shortest-outermost would read 'exs:x' back as 'ex:sub/x')."""
    from ontology_mapping_spark.sources.rdf import read_ntriples, write_ntriples

    prefixes = {"ex": "http://ex/", "exs": "http://ex/sub/"}
    df = spark.createDataFrame(
        [("exs:x", "ex:p", "ex:sub2")],
        "subject string, predicate string, object string",
    )
    path = str(tmp_path / "nested_nt")
    write_ntriples(df, path, prefixes)
    back = read_ntriples(spark, path, prefixes).collect()
    assert [tuple(r) for r in back] == [("exs:x", "ex:p", "ex:sub2")]


def test_read_ntriples_strict_and_lax(spark, tmp_path):
    import pytest

    from ontology_mapping_spark.sources.rdf import read_ntriples

    p = tmp_path / "mixed.nt"
    p.write_text(
        "# comment\n"
        '<http://e.org/a> <http://e.org/p> "ok" .\n'
        "\n"
        "this line is garbage\n"
    )
    with pytest.raises(Exception, match="unparseable"):
        # strict mode raises at the consuming action (check fused into
        # the scan, no pre-validation pass)
        read_ntriples(spark, str(p)).collect()
    got = read_ntriples(spark, str(p), strict=False).collect()
    assert [tuple(r) for r in got] == [("http://e.org/a", "http://e.org/p", "ok")]


def test_nquads_round_trip_mixed_graphs(spark, tmp_path):
    """write_nquads -> read_nquads round-trips a quad table exactly:
    named-graph rows carry the optional fourth term, NULL-graph rows
    serialize as plain 3-term (default-graph) lines and read back as
    NULL, and every term goes through the same adversarial alphabet as
    the triple round-trip."""
    import random

    from ontology_mapping_spark.sources.rdf import read_nquads, write_nquads

    rng = random.Random(20260819)
    alphabet = list('abc "\\\n\r\t<>:/.%μδ€') + ["kg:", "src:", "https://"]
    rows = []
    for i in range(120):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        g = rng.choice([None, "kg:asserted", "https://e.org/g/1", "g1"])
        rows.append((g, f"src:T{i}", "kg:label", s))
    df = spark.createDataFrame(
        rows, "graph string, subject string, predicate string, object string"
    )
    path = str(tmp_path / "kg_nq")
    write_nquads(df, path)
    back = read_nquads(spark, path)
    def key(r):
        return tuple("" if x is None else x for x in r)

    got = sorted((tuple(r) for r in back.collect()), key=key)
    assert got == sorted(rows, key=key)


def test_nquads_default_graph_lines_are_triples(spark, tmp_path):
    """NULL-graph quads emit spec-valid 3-term lines — byte-identical to
    the N-Triples sink for the same triples — so a default-graph-only
    quad table ships as a file any N-Triples consumer can read."""
    from ontology_mapping_spark.sources.rdf import nquads_lines, ntriples_lines

    rows = [("src:C1", "kg:isA", "tgt:C2"), ("src:C1", "kg:label", 'say "hi"')]
    tdf = spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )
    qdf = spark.createDataFrame(
        [(None, *r) for r in rows],
        "graph string, subject string, predicate string, object string",
    )
    nt = sorted(r["line"] for r in ntriples_lines(tdf).collect())
    nq = sorted(r["line"] for r in nquads_lines(qdf).collect())
    assert nq == nt


def test_nquads_strict_lax_and_triple_table_rejected(spark, tmp_path):
    import pytest

    from ontology_mapping_spark.sources.rdf import nquads_lines, read_nquads

    p = tmp_path / "mixed.nq"
    p.write_text(
        "# comment\n"
        '<http://e.org/a> <http://e.org/p> "ok" <http://e.org/g> .\n'
        '<http://e.org/a> <http://e.org/p> "default" .\n'
        "garbage line\n"
    )
    with pytest.raises(Exception, match="unparseable"):
        read_nquads(spark, str(p)).collect()
    got = sorted(
        (tuple(r) for r in read_nquads(spark, str(p), strict=False).collect()),
        key=str,
    )
    assert got == sorted(
        [
            ("http://e.org/g", "http://e.org/a", "http://e.org/p", "ok"),
            (None, "http://e.org/a", "http://e.org/p", "default"),
        ],
        key=str,
    )
    tdf = spark.createDataFrame(
        [("a", "b", "c")], "subject string, predicate string, object string"
    )
    with pytest.raises(ValueError, match="graph"):
        nquads_lines(tdf)
