"""Text normalization + boilerplate-stripping extraction: the golden-hash contract.

``normalize`` re-expresses thesis/process_data_features.py:183-187 —
lowercase, replace non-[a-z0-9 whitespace] with space, collapse whitespace,
strip. It exists in two byte-identical forms:

* :func:`normalize_py` — pure Python, used by the pytest oracle and inside
  pandas UDFs;
* :func:`normalize_col` — a Catalyst column expression (JVM-side, codegen'd),
  the hot-path implementation.

The golden-hash test suite pins the two together via SHA-256 per row
(BASELINE.json input_hint: "byte-identical extracted text per url").

Note on regex dialects: Python ``\\s`` (unicode) is a superset of Java
``\\s`` (ASCII), but the composition of the two substitutions maps any
unicode-space either to a kept-then-collapsed space (Python) or a
replaced-space (Java) — identical output. Verified by tests over the full
fixture corpus.

``extract_text`` strips HTML boilerplate deterministically (script/style/
nav/header/footer/aside removal, tag strip, entity decode). It likewise has
a pure form and a vectorized pandas-UDF form; the UDF calls the pure
function so the invariant holds trivially by construction.
"""

from __future__ import annotations

import html as _htmlmod
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# normalize (thesis/process_data_features.py:183-187 semantics)
# ---------------------------------------------------------------------------

_NON_ALNUM = re.compile(r"[^a-z0-9\s]")
_WS = re.compile(r"\s+")


def normalize_py(text: str | None) -> str:
    """Pure-Python golden normalizer. None-safe (None -> '')."""
    if text is None:
        return ""
    text = text.lower()
    text = _NON_ALNUM.sub(" ", text)
    text = _WS.sub(" ", text)
    return text.strip()


def normalize_col(c: Column | str) -> Column:
    """Catalyst-expression twin of :func:`normalize_py` (JVM, codegen'd)."""
    col = F.col(c) if isinstance(c, str) else c
    out = F.lower(col)
    out = F.regexp_replace(out, r"[^a-z0-9\s]", " ")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


# SQL-string twin (same expression, for spark.sql and for the DuckDB oracle;
# both engines' regexp_replace support these patterns; DuckDB needs the 'g'
# flag which Spark applies implicitly).
def normalize_sql(expr: str, dialect: str = "spark") -> str:
    if dialect == "duckdb":
        return (
            "trim(regexp_replace(regexp_replace(lower(" + expr + "), "
            "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
        )
    return (
        "trim(regexp_replace(regexp_replace(lower(" + expr + "), "
        "'[^a-z0-9\\\\s]', ' '), '\\\\s+', ' '))"
    )


# ---------------------------------------------------------------------------
# HTML -> text extraction (north-star stage S1; no counterpart in the
# reference, whose inputs are OWL files — semantics defined here and pinned
# by golden hashes)
# ---------------------------------------------------------------------------

_BOILER = re.compile(
    r"<(script|style|nav|header|footer|aside|noscript|title)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG = re.compile(r"<[^>]+>")


def extract_text_py(html: bytes | str | None) -> str:
    """Deterministic boilerplate-stripped text from raw HTML bytes.

    Order: decode utf-8 (replace) -> drop comments -> drop boilerplate
    containers -> strip tags -> unescape entities -> collapse whitespace.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    text = _COMMENT.sub(" ", html)
    text = _BOILER.sub(" ", text)
    text = _TAG.sub(" ", text)
    text = _htmlmod.unescape(text)
    return _WS.sub(" ", text).strip()


# ---------------------------------------------------------------------------
# fused tokenizer for the hot mention-scan path
# ---------------------------------------------------------------------------

_ALNUM = re.compile(r"[a-z0-9]+")
# byte-translate table: keep [a-z0-9], everything else becomes a space —
# C-speed tokenizer for the (overwhelmingly common) pure-ASCII page
_TO_SPACE = bytes(
    b if (97 <= b <= 122 or 48 <= b <= 57) else 32 for b in range(256)
)


def _tokens_from_text(text: str) -> list[str]:
    """[a-z0-9]+ runs of the lowered text == normalize_py(text).split().

    ASCII fast path: bytes.translate + split (~4x the regex findall);
    exact for ASCII because both reduce to 'split on non-[a-z0-9]'.
    Non-ASCII falls back to the regex (unicode lowering can produce
    combining marks whose token boundaries the byte path would miss)."""
    if text.isascii():
        return text.lower().encode("ascii").translate(_TO_SPACE).decode("ascii").split()
    return _ALNUM.findall(text.lower())


# The C scan kernel (native/acscan.c ac_scan_multi_fold) folds bytes on the
# fly: A-Z -> a-z, [a-z0-9] kept, EVERY other byte (incl. all non-ASCII
# UTF-8 bytes) a token separator. That equals _tokens_from_text for every
# character except the ones whose str.lower() contains an ASCII alnum while
# the char itself is non-ASCII — enumerating all of Unicode yields exactly
# two: U+0130 (İ -> 'i'+combining dot) and U+212A (KELVIN SIGN -> 'k').
# Pages containing either take the Python tokenizer; everything else goes
# to C as raw bytes.
_EXOTIC_LOWER = re.compile("[İK]")


def fold_safe_py(text: str) -> bool:
    """True when byte-level folding tokenizes identically to
    :func:`_tokens_from_text` (always true for pure-ASCII text)."""
    return text.isascii() or _EXOTIC_LOWER.search(text) is None


def foldable_text_py(text: str | None) -> bytes:
    """Bytes the C fold+scan kernel may consume directly: the raw UTF-8
    text when fold-safe, else the pre-tokenized join (tokens are [a-z0-9]+
    so the fold pass forwards them unchanged). Skips the whitespace
    collapse — the C fold collapses separator runs itself."""
    if text is None:
        return b""
    if fold_safe_py(text):
        # errors="replace": Arrow/Spark strings are always valid UTF-8, but a
        # pure-Python caller may hold lone surrogates — '?' is a separator
        # byte for the C fold, matching _tokens_from_text (surrogates are
        # non-alnum, so both paths tokenize them as separators).
        return text.encode("utf-8", errors="replace")
    return " ".join(_tokens_from_text(text)).encode("ascii")


def foldable_text_from_html_py(html: bytes | str | None) -> bytes:
    """HTML -> bytes for the C fold+scan kernel: extraction (comment/
    boilerplate/tag strip + entity unescape) stays in Python regex, but the
    lower/tokenize/join work moves into the C pass. Token-equivalent to
    ``tokens_from_html_py`` (pinned by tests/test_mentions.py)."""
    if html is None:
        return b""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    text = _COMMENT.sub(" ", html)
    text = _BOILER.sub(" ", text)
    text = _TAG.sub(" ", text)
    text = _htmlmod.unescape(text)
    return foldable_text_py(text)


def tokens_from_html_py(html: bytes | str | None) -> list[str]:
    """Token stream of ``normalize_py(extract_text_py(html)).split()`` in a
    single pass fewer: the normalize sub()+sub()+split triple is replaced by
    one ``findall([a-z0-9]+)`` over the lowered extracted text (alnum runs
    ARE the normalized tokens — anything else becomes a separator either
    way). ~1.7x on the per-page kernel; equivalence is pinned by
    tests/test_textnorm.py over the fixture corpus."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    text = _COMMENT.sub(" ", html)
    text = _BOILER.sub(" ", text)
    text = _TAG.sub(" ", text)
    text = _htmlmod.unescape(text)
    return _tokens_from_text(text)
