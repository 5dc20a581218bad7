"""String-operator library: token stats + the normalization op suite.

Re-expresses (a) the token-set features of thesis/process_data_features.py
(token_jaccard :107-109, shared-token stats :156-166) and (b) the
normalization service of thesis/normalization.py:190-359 as pure Catalyst
column expressions — no Python in the hot path. Python ``set`` semantics are
matched by ``array_distinct`` before set algebra.

Each op also has a pure-Python twin (suffix ``_py``) used by the pytest
oracle, pinned together by property tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# token-set features (over already-normalized, space-joined label strings)
# ---------------------------------------------------------------------------

def tokens_col(c: Column | str) -> Column:
    """Whitespace tokens as a distinct array (Python set semantics);
    empty string -> empty array (``split('') == ['']`` is filtered out)."""
    return F.array_distinct(
        F.filter(F.split(_c(c), r"\s+"), lambda t: t != F.lit(""))
    )


def token_jaccard_col(l1: Column | str, l2: Column | str) -> Column:
    """|A∩B| / |A∪B| over whitespace tokens; 0.0 when both empty
    (thesis/process_data_features.py:107-109)."""
    a, b = tokens_col(l1), tokens_col(l2)
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(a, b)).cast("double") / union
    )


def token_jaccard_py(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    return len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0


def shared_token_stats(l1: Column | str, l2: Column | str) -> dict[str, Column]:
    """shared count + per-side ratios (thesis/process_data_features.py:156-166)."""
    a, b = tokens_col(l1), tokens_col(l2)
    shared = F.size(F.array_intersect(a, b))
    n1, n2 = F.size(a), F.size(b)
    return {
        "shared_tokens_count": shared.cast("double"),
        "token_ratio_c1": F.when(n1 > 0, shared.cast("double") / n1).otherwise(F.lit(0.0)),
        "token_ratio_c2": F.when(n2 > 0, shared.cast("double") / n2).otherwise(F.lit(0.0)),
    }


# ---------------------------------------------------------------------------
# normalization op suite (thesis/normalization.py — operator spec)
# ---------------------------------------------------------------------------

GREEK_MAP = {
    # upper (thesis/normalization.py:193-216 semantics)
    "Α": "Alpha", "Β": "Beta", "Γ": "Gamma", "Δ": "Delta",
    "Ε": "Epsilon", "Ζ": "Zeta", "Η": "Eta", "Θ": "Theta",
    "Ι": "Iota", "Κ": "Kappa", "Λ": "Lambda", "Μ": "Mu",
    "Ν": "Nu", "Ξ": "Xi", "Ο": "Omicron", "Π": "Pi",
    "Ρ": "Rho", "Σ": "Sigma", "Τ": "Tau", "Υ": "Ypsilon",
    "Φ": "Phi", "Χ": "Chi", "Ψ": "Psi", "Ω": "Omega",
    # lower (:217-241); both sigma forms -> "sigma"
    "α": "alpha", "β": "beta", "γ": "gamma", "δ": "delta",
    "ε": "epsilon", "ζ": "zeta", "η": "eta", "θ": "theta",
    "ι": "iota", "κ": "kappa", "λ": "lambda", "μ": "mu",
    "ν": "nu", "ξ": "xi", "ο": "omicron", "π": "pi",
    "ρ": "rho", "ς": "sigma", "σ": "sigma", "τ": "tau",
    "υ": "ypsilon", "φ": "phi", "χ": "chi", "ψ": "psi",
    "ω": "omega",
}

TYPOGRAPHIC_MAP = {
    "−": "-", "–": "-", "—": "-", "“": '"', "”": '"',
    "‘": "'", "’": "'",
}

_PUNCT_PATTERN = (
    r"[_\.,;:!?\*‐\-–—#<>\(\)\[\]„“”‘’'\"/\\\|%\^~`$=\+\{\}@&′″、]"
)


def replace_greek_col(c: Column | str) -> Column:
    """Greek letters -> Latin names (thesis/normalization.py:190-246)."""
    out = _c(c)
    for ch, name in GREEK_MAP.items():
        out = F.regexp_replace(out, ch, name)
    return out


def replace_greek_py(s: str) -> str:
    for ch, name in GREEK_MAP.items():
        s = s.replace(ch, name)
    return s


def replace_typographic_col(c: Column | str) -> Column:
    """Curly quotes/dashes -> ASCII (thesis/normalization.py:248-258)."""
    src = "".join(TYPOGRAPHIC_MAP.keys())
    dst = "".join(TYPOGRAPHIC_MAP.values())
    return F.translate(_c(c), src, dst)


def replace_typographic_py(s: str) -> str:
    return s.translate(str.maketrans(TYPOGRAPHIC_MAP))


def remove_qualifiers_col(c: Column | str, end_only: bool = True) -> Column:
    """Strip "(...)" qualifiers (thesis/normalization.py:260-272)."""
    pattern = r"\s*?\(.*?\)\s*?$" if end_only else r"\s*?\(.*?\)\s*?"
    return F.regexp_replace(_c(c), pattern, "")


def remove_qualifiers_py(s: str, end_only: bool = True) -> str:
    pattern = r"\s*?\(.*?\)\s*?$" if end_only else r"\s*?\(.*?\)\s*?"
    return re.sub(pattern, "", s)


def remove_whitespace_col(c: Column | str) -> Column:
    """Trim + collapse runs of whitespace (thesis/normalization.py:274-283)."""
    return F.trim(F.regexp_replace(_c(c), r"\s{2,}", " "))


def remove_punctuation_col(c: Column | str, replace_with_space: bool = False) -> Column:
    """Strip punctuation incl. some non-ASCII (thesis/normalization.py:285-294)."""
    return F.regexp_replace(_c(c), _PUNCT_PATTERN, " " if replace_with_space else "")


def remove_punctuation_py(s: str, replace_with_space: bool = False) -> str:
    return re.sub(_PUNCT_PATTERN, " " if replace_with_space else "", s)


def fold_accents_py(s: str) -> str:
    """ASCII-fold accented characters via NFD decomposition + combining-mark
    strip (stdlib twin of unidecode for Latin scripts; reference:
    thesis/normalization.py:350-359)."""
    import unicodedata

    return "".join(
        ch for ch in unicodedata.normalize("NFD", s) if not unicodedata.combining(ch)
    )


def make_fold_accents_udf():
    import pandas as pd
    from pyspark.sql import functions as _F
    from pyspark.sql import types as _T

    def _fold(s):
        return pd.Series([fold_accents_py(x) if x is not None else None for x in s])

    return _F.pandas_udf(_fold, _T.StringType())


def tokenize_py(s: str) -> list[str]:
    """Whitespace+punct tokenizer (the engine default; the reference's NLTK
    Treebank tokenizer, thesis/normalization.py:296-305, slots into the same
    pandas-UDF seam when nltk is available)."""
    import re as _re

    return _re.findall(r"[a-z0-9]+|[^\sa-z0-9]", s.lower())


def natural_word_order_col(c: Column | str) -> Column:
    """Split on commas, drop space-only segments, reverse segment order,
    rejoin with spaces (thesis/normalization.py:333-348; the reference
    removes only the FIRST lone-space part — canonicalized here to
    removing all of them, same result for well-formed label text, and the
    pure-Python twin uses the identical rule)."""
    return F.array_join(
        F.reverse(F.array_remove(F.split(_c(c), r"\s?,\s?"), " ")), " "
    )


def natural_word_order_py(s: str) -> str:
    parts = [p for p in re.split(r"\s?,\s?", s) if p != " "]
    parts.reverse()
    return " ".join(parts)


# ---------------------------------------------------------------------------
# NLTK seam: tokenize / stem / lemmatize (thesis/normalization.py:296-331)
# ---------------------------------------------------------------------------

def _nltk_kernels():
    """Build the three NLTK callables the reference uses (TreebankWord-
    Tokenizer / SnowballStemmer("english") / WordNetLemmatizer), loaded
    once per process. Raises ImportError when nltk is absent — callers
    choose the fallback."""
    import nltk

    tok = nltk.TreebankWordTokenizer()
    stem = nltk.SnowballStemmer("english")
    lem = nltk.WordNetLemmatizer()
    return tok.tokenize, stem.stem, lem.lemmatize


# worker-side kernel cache: a closure-level dict would NOT survive task
# deserialization (each task gets a fresh closure copy) — module state is
# the once-per-worker-process scope, same pattern as vectors._MODEL_CACHE
_NLTK_CACHE: dict[str, tuple] = {}


def make_nltk_udfs():
    """(tokenize_udf, stem_udf, lemmatize_udf) — Arrow-batched pandas UDFs
    over the reference's NLTK kernels, loaded once per Python worker via
    the module-level cache (same pattern as make_model_embed_udf). The
    kernels are exercised driver-side HERE — tokenize + stem + lemmatize
    on a probe word — so a missing nltk library AND missing corpora
    (punkt/wordnet resolve lazily, raising LookupError on first real
    call) both fail at PLAN time, not in an executor task;
    :func:`tokenize_py` is the contained fallback."""
    _probe_tok, _probe_stem, _probe_lem = _nltk_kernels()
    _probe_tok("driver-side probe")
    _probe_stem("probes")
    _probe_lem("probes")  # LookupError here if the wordnet corpus is absent

    import pandas as pd
    from pyspark.sql import functions as _F
    from pyspark.sql import types as _T

    def _k():
        if "k" not in _NLTK_CACHE:
            _NLTK_CACHE["k"] = _nltk_kernels()
        return _NLTK_CACHE["k"]

    def _tok(s: pd.Series) -> pd.Series:
        tokenize, _, _ = _k()
        return pd.Series([tokenize(x) if x is not None else None for x in s])

    def _stem(s: pd.Series) -> pd.Series:
        _, stem, _ = _k()
        return pd.Series([stem(x) if x is not None else None for x in s])

    def _lem(s: pd.Series) -> pd.Series:
        _, _, lemmatize = _k()
        return pd.Series([lemmatize(x) if x is not None else None for x in s])

    return (
        _F.pandas_udf(_tok, _T.ArrayType(_T.StringType())),
        _F.pandas_udf(_stem, _T.StringType()),
        _F.pandas_udf(_lem, _T.StringType()),
    )


# --------------------------------------------------------------------------
# URL canonicalization (training-data pipeline op: URL-keyed dedup is the
# cheapest first-pass dedup at crawl scale — no reference analog, the
# reference has no URLs; contract defined here, Python twin is the oracle)
# --------------------------------------------------------------------------

_TRACKING_PARAM = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="


def canonical_url_col(u: Column) -> Column:
    """Canonical form of an absolute http(s) URL, pure Catalyst:

    1. strip the fragment (``#...``);
    2. lowercase the scheme://host[:port] prefix (path/query stay
       case-sensitive per URL semantics);
    3. drop a leading ``www.``;
    4. drop default ports (``:80`` http, ``:443`` https);
    5. drop tracking query params (utm_*, fbclid, gclid, msclkid, ref),
       keeping the rest in their original order; drop an emptied ``?``;
    6. drop one trailing slash from the path (before the query too).

    Non-http(s) strings pass through steps 1/5/6 only (no scheme prefix
    matches). Twin: :func:`canonical_url_py` — pinned equal by pytest.
    """
    u = F.regexp_replace(u, r"#.*$", "")
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)", 1)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*", "")
    u = F.concat(F.lower(head), rest)
    u = F.regexp_replace(u, r"^(https?://)www\.", "$1")
    u = F.regexp_replace(u, r"^(http://[^/:?]*):80([/?]|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?]*):443([/?]|$)", "$1$2")
    base = F.regexp_replace(u, r"\?.*$", "")
    base = F.regexp_replace(base, r"([^/])/$", "$1")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(_TRACKING_PARAM),
    )
    return F.when(
        F.size(params) > 0, F.concat(base, F.lit("?"), F.array_join(params, "&"))
    ).otherwise(base)


def canonical_url_py(u: str) -> str:
    """Pure-Python twin of :func:`canonical_url_col` (the pytest oracle)."""
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)", u)
    if m:
        u = m.group(1).lower() + u[m.end() :]
    u = re.sub(r"^(https?://)www\.", r"\1", u)
    u = re.sub(r"^(http://[^/:?]*):80([/?]|$)", r"\1\2", u)
    u = re.sub(r"^(https://[^/:?]*):443([/?]|$)", r"\1\2", u)
    base = re.sub(r"\?.*$", "", u)
    base = re.sub(r"([^/])/$", r"\1", base)
    qm = re.search(r"\?(.*)$", u)
    params = [
        p
        for p in (qm.group(1).split("&") if qm else [])
        if p and not re.match(_TRACKING_PARAM, p)
    ]
    return base + ("?" + "&".join(params) if params else "")


# --------------------------------------------------------------------------
# PII scrubbing (training-data pipeline op; patterns kept RE2-compatible —
# no lookarounds/backrefs — so the DuckDB oracle runs the SAME regexes)
# --------------------------------------------------------------------------

PII_PATTERNS = {
    # order matters: emails before phones (an email's digits must not be
    # half-eaten by the phone pass), ips before phones (dotted quads
    # contain digit runs)
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{9,15}",  # international form only — deliberately
    # conservative: bare national digit runs collide with ids/quantities
}


def scrub_pii_cols(text: Column) -> dict[str, Column]:
    """{'clean_text', 'n_email', 'n_ip', 'n_phone'} — text with each PII
    class replaced by its <CLASS> token, plus per-class match counts.
    Pure Catalyst (regexp_replace / regexp_count); the one-pass-per-class
    chain is a single projection, no shuffle."""
    out: dict[str, Column] = {}
    clean = text
    for name, pat in PII_PATTERNS.items():
        out[f"n_{name}"] = F.regexp_count(clean, F.lit(pat)).cast("int")
        clean = F.regexp_replace(clean, pat, f"<{name.upper()}>")
    out["clean_text"] = clean
    return out


def scrub_pii_py(text: str) -> tuple[str, dict[str, int]]:
    """Pure-Python twin of :func:`scrub_pii_cols` (pytest oracle)."""
    counts: dict[str, int] = {}
    for name, pat in PII_PATTERNS.items():
        counts[f"n_{name}"] = len(re.findall(pat, text))
        text = re.sub(pat, f"<{name.upper()}>", text)
    return text, counts
