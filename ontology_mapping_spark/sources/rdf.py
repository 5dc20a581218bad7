"""N-Triples serialization sink for the emitted KG.

SURVEY §2.1 declared RDF/XML serialization out of scope (the reference
never writes RDF back out); N-Triples is the format a KG at 10^12-triple
scale actually ships — line-oriented, so the sink is a plain distributed
text write with no cross-row state, mergeable by any downstream tool.

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


_TERM_RE = r'(<[^>]*>|"(?:[^"\\]|\\.)*")'
_LINE_RE = rf"^\s*{_TERM_RE}\s+{_TERM_RE}\s+{_TERM_RE}\s+\.\s*$"
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
    lines = spark.read.text(path).select(F.col("value").alias("line"))
    content = lines.filter(
        (F.trim("line") != "") & ~F.trim(F.col("line")).startswith("#")
    )
    parsed = content.select(
        "line",
        *[
            F.regexp_extract("line", _LINE_RE, i).alias(c)
            for i, c in ((1, "s"), (2, "p"), (3, "o"))
        ],
    )
    if strict:
        parsed = parsed.withColumn(
            "s",
            F.when(
                F.col("s") == "",
                F.raise_error(
                    F.concat(
                        F.lit("unparseable N-Triples line: "),
                        F.col("line"),
                        F.lit(" (pass strict=False to skip malformed lines)"),
                    )
                ),
            ).otherwise(F.col("s")),
        )
    good = parsed.filter(F.col("s") != "")
    return good.select(
        _parse_term(F.col("s"), prefixes).alias("subject"),
        _parse_term(F.col("p"), prefixes).alias("predicate"),
        _parse_term(F.col("o"), prefixes).alias("object"),
    )
