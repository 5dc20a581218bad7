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


def _sanitize_iri(c: Column) -> Column:
    for ch, enc in ((" ", "%20"), ("<", "%3C"), (">", "%3E"), ('"', "%22")):
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
