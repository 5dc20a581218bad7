"""N-Triples / N-Quads serialization sink + reader for the emitted KG.

SURVEY §2.1 declared RDF/XML serialization out of scope (the reference
never writes RDF back out); N-Triples is the format a KG at 10^12-triple
scale actually ships — line-oriented, so the sink is a plain distributed
text write with no cross-row state, mergeable by any downstream tool.
N-Quads is its named-graph twin for the engine's quad tables (a
``graph`` column): the graph label is the optional fourth term, NULL
graphs serialize as plain default-graph triple lines.

Serialization contract (documented, mirrored by the DuckDB oracle and
the pytest parser twin):

* a term that is already an absolute IRI (``scheme://...``) passes
  through;
* a ``prefix:rest`` term whose prefix is in the prefix map expands to
  ``namespace + rest``;
* anything else serializes as a quoted literal with N-Triples string
  escaping (backslash, quote, newline, carriage return, tab);
* IRIs are defensively sanitized: space and angle brackets (the
  characters our synthetic URLs/URIs could plausibly smuggle in) are
  percent-encoded. Anything more exotic should be cleaned upstream —
  this sink will not silently mangle it further.

Scale notes: every transformation is a codegen'd string projection on
the triple row — zero shuffles, zero Python; the write is the standard
partitioned text sink.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# namespaces for the engine's compact terms (config-overridable)
DEFAULT_PREFIXES: dict[str, str] = {
    "kg": "http://example.org/kg#",
    "src": "http://example.org/src/",
    "tgt": "http://example.org/tgt/",
    "uri": "http://example.org/id/",
}

_ABS_IRI = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


# the sink's IRI sanitization table, IN APPLICATION ORDER: '%' first so
# the encodings stay unambiguous and decodable; newline/CR/tab must be
# encoded or a smuggled control character breaks the sink's
# line-orientation (caught by the distributed reader round-trip test).
# SINGLE SOURCE OF TRUTH — the reader decodes it in reverse, the DuckDB
# oracle (queries._nt_sanitize_sql) and the pure-Python parser twin
# (tests/test_rdf_sink.py) generate their mirrors from this table.
IRI_SANITIZE: tuple[tuple[str, str], ...] = (
    ("%", "%25"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("\n", "%0A"),
    ("\r", "%0D"),
    ("\t", "%09"),
)


def _sanitize_iri(c: Column) -> Column:
    for ch, enc in IRI_SANITIZE:
        c = F.replace(c, F.lit(ch), F.lit(enc))
    return c


def _escape_literal(c: Column) -> Column:
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def term_expr(col: Column | str, prefixes: dict[str, str] | None = None) -> Column:
    """One RDF term: ``<iri>`` (absolute or prefix-expanded) or a quoted
    escaped literal."""
    c = F.col(col) if isinstance(col, str) else col
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    out = F.concat(F.lit('"'), _escape_literal(c), F.lit('"'))  # literal fallback
    for p, ns in sorted(prefixes.items(), reverse=True):
        out = F.when(
            c.startswith(p + ":"),
            F.concat(
                F.lit("<"),
                _sanitize_iri(
                    F.concat(F.lit(ns), F.substring(c, len(p) + 2, 2_000_000))
                ),
                F.lit(">"),
            ),
        ).otherwise(out)
    return F.when(
        c.rlike(_ABS_IRI), F.concat(F.lit("<"), _sanitize_iri(c), F.lit(">"))
    ).otherwise(out)


def ntriples_lines(
    triples: DataFrame, prefixes: dict[str, str] | None = None
) -> DataFrame:
    """(subject, predicate, object) -> single-column (line) N-Triples."""
    return triples.select(
        F.concat_ws(
            " ",
            term_expr("subject", prefixes),
            term_expr("predicate", prefixes),
            term_expr("object", prefixes),
            F.lit("."),
        ).alias("line")
    )


def write_ntriples(
    triples: DataFrame, path: str, prefixes: dict[str, str] | None = None
) -> None:
    """Distributed N-Triples text write (one ``.nt`` shard per task)."""
    ntriples_lines(triples, prefixes).write.mode("overwrite").text(path)


def nquads_lines(
    quads: DataFrame, prefixes: dict[str, str] | None = None
) -> DataFrame:
    """(graph, subject, predicate, object) -> single-column (line) N-Quads.

    The engine's named-graph layer (a quad table with a ``graph``
    column) ships in N-Quads: the graph label is the OPTIONAL fourth
    term, so a NULL graph serializes as a plain 3-term line (the
    default graph, per the format) and everything else appends the
    graph term before the final '.'. Each term goes through the same
    ``term_expr`` contract as the triple sink — note the N-Quads spec
    restricts graph labels to IRIs/blank nodes, so a bare engine-side
    graph name (not absolute, not in the prefix map) serializes as a
    quoted literal: exact for sink→reader round-trips of internal quad
    tables, but use IRI graph names when shipping to external tools.
    Same distributed shape as the triple sink: one codegen'd string
    projection, zero shuffles, zero Python."""
    if "graph" not in quads.columns:
        raise ValueError(
            f"nquads_lines needs a 'graph' column (got {quads.columns}); "
            "for a plain triple table use ntriples_lines"
        )
    spo = [
        term_expr("subject", prefixes),
        term_expr("predicate", prefixes),
        term_expr("object", prefixes),
    ]
    return quads.select(
        F.when(
            F.col("graph").isNull(),
            F.concat_ws(" ", *spo, F.lit(".")),
        )
        .otherwise(
            F.concat_ws(" ", *spo, term_expr("graph", prefixes), F.lit("."))
        )
        .alias("line")
    )


def write_nquads(
    quads: DataFrame, path: str, prefixes: dict[str, str] | None = None
) -> None:
    """Distributed N-Quads text write (one ``.nq`` shard per task)."""
    nquads_lines(quads, prefixes).write.mode("overwrite").text(path)


_TERM_RE = r'(<[^>]*>|"(?:[^"\\]|\\.)*")'
_LINE_RE = rf"^\s*{_TERM_RE}\s+{_TERM_RE}\s+{_TERM_RE}\s+\.\s*$"
_QLINE_RE = (
    rf"^\s*{_TERM_RE}\s+{_TERM_RE}\s+{_TERM_RE}(?:\s+{_TERM_RE})?\s+\.\s*$"
)
# an out-of-band sentinel for the two-phase backslash unescape; literals
# containing this exact byte pair are outside the serialization contract
# (the sink's own docstring already demands exotic content be cleaned
# upstream)
_UNESC_SENTINEL = "\x00\x01"


def _parse_term(c: Column, prefixes: dict[str, str]) -> Column:
    """Inverse of ``term_expr``: '<iri>' strips brackets, percent-decodes
    the sink's sanitization set, and re-compacts against the prefix map
    (longest namespace first); a quoted literal unescapes."""
    iri = F.substring(c, 2, 2_000_000)
    iri = F.substring(iri, 1, F.length(iri) - 1)
    # decode in REVERSE table order (inverse of the sink's chain)
    for ch, enc in reversed(IRI_SANITIZE):
        iri = F.replace(iri, F.lit(enc), F.lit(ch))
    compact = iri
    # build the when-chain ASCENDING by namespace length: the last
    # condition built is the OUTERMOST, so the longest namespace wins
    # for nested prefix maps (e.g. 'http://ex/' inside 'http://ex/sub/')
    for p, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        compact = F.when(
            iri.startswith(ns),
            F.concat(
                F.lit(p + ":"), F.substring(iri, len(ns) + 1, 2_000_000)
            ),
        ).otherwise(compact)
    lit = F.substring(c, 2, 2_000_000)
    lit = F.substring(lit, 1, F.length(lit) - 1)
    # two-phase unescape: park '\\\\' behind a sentinel so '\\n' (escaped
    # backslash + n) is not mistaken for a newline escape, then restore
    lit = F.replace(lit, F.lit("\\\\"), F.lit(_UNESC_SENTINEL))
    for esc, ch in (("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t"), ('\\"', '"')):
        lit = F.replace(lit, F.lit(esc), F.lit(ch))
    lit = F.replace(lit, F.lit(_UNESC_SENTINEL), F.lit("\\"))
    return F.when(c.startswith("<"), compact).otherwise(lit)


def _read_lines(
    spark,
    path: str,
    line_re: str,
    captures: Sequence[tuple[int, str]],
    format_name: str,
    strict: bool,
) -> DataFrame:
    """Shared scaffolding of the N-Triples / N-Quads readers: one line
    scan, comment (``#``) and blank lines skipped per the formats, the
    term captures extracted by ``line_re``, and — under ``strict`` — a
    ``raise_error`` fused into the projection so an unparseable line
    raises at the consuming action (the reader stays lazy, the file is
    read once, and a silent drop can never under-count the KG)."""
    lines = spark.read.text(path).select(F.col("value").alias("line"))
    content = lines.filter(
        (F.trim("line") != "") & ~F.trim(F.col("line")).startswith("#")
    )
    parsed = content.select(
        "line",
        *[
            F.regexp_extract("line", line_re, i).alias(c)
            for i, c in captures
        ],
    )
    if strict:
        parsed = parsed.withColumn(
            "s",
            F.when(
                F.col("s") == "",
                F.raise_error(
                    F.concat(
                        F.lit(f"unparseable {format_name} line: "),
                        F.col("line"),
                        F.lit(" (pass strict=False to skip malformed lines)"),
                    )
                ),
            ).otherwise(F.col("s")),
        )
    return parsed.filter(F.col("s") != "")


def read_ntriples(
    spark,
    path: str,
    prefixes: dict[str, str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Distributed N-Triples read -> (subject, predicate, object), the
    inverse of :func:`write_ntriples`: IRIs in a declared namespace
    compact back to the engine's ``prefix:rest`` terms, other IRIs stay
    absolute, literals unescape — so sink→reader round-trips the triple
    table exactly (pytest-pinned on adversarial terms).

    Pure codegen string work on the line scan (regexp_extract + chained
    replaces) — zero shuffles, zero Python; comment (``#``) and blank
    lines are skipped per the format. ``strict=True`` (default) makes
    any unparseable line RAISE at the consuming action (the check is
    fused into the scan via ``raise_error`` — the reader stays lazy and
    the file is read once, not pre-validated in an extra pass); a
    silent drop would under-count the KG. Pass ``strict=False`` to skip
    malformed lines when ingesting third-party dumps."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    good = _read_lines(
        spark,
        path,
        _LINE_RE,
        ((1, "s"), (2, "p"), (3, "o")),
        "N-Triples",
        strict,
    )
    return good.select(
        _parse_term(F.col("s"), prefixes).alias("subject"),
        _parse_term(F.col("p"), prefixes).alias("predicate"),
        _parse_term(F.col("o"), prefixes).alias("object"),
    )


def read_nquads(
    spark,
    path: str,
    prefixes: dict[str, str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Distributed N-Quads read -> (graph, subject, predicate, object),
    the inverse of :func:`write_nquads`: the optional fourth term binds
    the ``graph`` column, and a plain 3-term (default-graph) line reads
    back as a NULL graph — so sink→reader round-trips a quad table
    exactly, mixed default/named rows included. Same plan shape and
    strict/lax contract as :func:`read_ntriples` (one line scan, pure
    codegen, ``raise_error`` fused into the projection — both share
    :func:`_read_lines`)."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    good = _read_lines(
        spark,
        path,
        _QLINE_RE,
        ((1, "s"), (2, "p"), (3, "o"), (4, "g")),
        "N-Quads",
        strict,
    )
    return good.select(
        F.when(F.col("g") == "", F.lit(None).cast("string"))
        .otherwise(_parse_term(F.col("g"), prefixes))
        .alias("graph"),
        _parse_term(F.col("s"), prefixes).alias("subject"),
        _parse_term(F.col("p"), prefixes).alias("predicate"),
        _parse_term(F.col("o"), prefixes).alias("object"),
    )
