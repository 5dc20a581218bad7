"""Mention detection: find ontology label phrases in page text.

Two interchangeable implementations (tested equal):

* :func:`mentions_via_join` — fully declarative: explode distinct page
  tokens, broadcast-join against label first-tokens (the blocking trick,
  pruning the pages × phrases cross product), then verify whole-phrase
  containment with JVM string ops. n_hits = number of token START
  POSITIONS where the phrase matches (overlapping counted — a
  self-overlapping phrase like 'sub sub' in 'sub sub sub' counts 2);
  both implementations and the pytest oracle share this definition.
* :func:`mentions_via_trie` — the north-star path (BASELINE.json: "batched
  mention detection ... with a broadcast ontology trie"): a token-trie of
  all phrases broadcast to executors, scanned per Arrow batch inside
  ``mapInArrow`` (longest-match-first per start token, still emitting
  every distinct phrase match).

Phrase matching is token-bounded: both text and phrases pass through the
golden ``normalize`` and matching is on space-padded normalized strings, so
"deep gland" never matches inside "deeper glands".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.schemas import MENTIONS
from ontology_mapping_spark.textnorm import normalize_col


def label_phrases(labels: DataFrame) -> DataFrame:
    """(uri, labels array) -> distinct non-empty (uri, phrase), phrase
    normalized. Each prefLabel/synonym matches independently (the
    reference's label lists, thesis/process_data_features.py:12-24)."""
    return (
        labels.select("uri", F.explode("labels").alias("raw"))
        .select("uri", normalize_col("raw").alias("phrase"))
        .filter(F.col("phrase") != "")
        .distinct()
    )


def phrase_hit_count_expr() -> "F.Column":
    """n_hits = number of token start positions where the phrase's token
    array (``ptoks``) matches inside the page token array (``toks``) —
    overlap-safe, identical to the trie scan's per-start-position count.
    Shared by the batch blocking join and the streaming path so the
    matching semantics cannot drift between them."""
    return F.expr(
        "case when size(toks) >= size(ptoks) then "
        "cast(size(filter(sequence(0, size(toks) - size(ptoks)), "
        "i -> slice(toks, i + 1, size(ptoks)) == ptoks)) as int) "
        "else 0 end"
    )


def phrase_token_table(phrases: DataFrame) -> DataFrame:
    """(uri, phrase, token=first token, ptoks=token array) — the broadcast
    side of the first-token blocking join."""
    return phrases.select(
        "uri",
        "phrase",
        F.split(F.col("phrase"), " ")[0].alias("token"),
        F.split(F.col("phrase"), " ").alias("ptoks"),
    )


def mentions_via_join(
    pages_text: DataFrame, phrases: DataFrame, broadcast_vocab: bool = True
) -> DataFrame:
    """(url, text) × (uri, phrase) -> (url, uri, surface, n_hits).

    Blocking: a page can only contain a phrase if it contains the phrase's
    first token, so join exploded distinct page tokens to phrase first
    tokens (broadcast — the ontology is the small side), then verify
    containment on the padded normalized text. Everything is JVM built-ins;
    the phrase list never leaves the JVM.

    ``broadcast_vocab=False`` drops the broadcast hint for
    gazetteer-scale vocabularies past even the JVM-broadcast budget
    (~5M+ phrases): the join shuffles both sides on the first token and
    AQE picks the strategy from runtime sizes. See
    :func:`detect_mentions` for the crossover policy.
    """
    norm_pages = pages_text.select(
        "url", F.split(normalize_col("text"), " ").alias("toks")
    )
    page_tokens = norm_pages.select(
        "url", "toks", F.explode(F.array_distinct("toks")).alias("token")
    )
    vocab = phrase_token_table(phrases)
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    joined = page_tokens.join(vocab, "token")
    hits = joined.withColumn("n_hits", phrase_hit_count_expr()).filter(
        F.col("n_hits") > 0
    )
    return hits.select(
        "url", "uri", F.col("phrase").alias("surface"), "n_hits"
    ).distinct()


# ---- gazetteer crossover -------------------------------------------------
#
# The broadcast-vocabulary C kernel (mentions_via_trie / mentions_from_html)
# is the flagship for ONTOLOGY-sized vocabularies: phrase rows are collected
# to the driver and rebuilt as a per-worker automaton, so its budget is
# driver + worker memory, NOT data size. The automaton's open-addressing
# goto table costs ~50-100 bytes per PATTERN BYTE (4x-slot power-of-two
# hash at 12 B/slot plus fail/output arrays), so a 10M-phrase gazetteer
# (~300 MB of pattern bytes) would want tens of GB in EVERY worker process
# — the broadcast path must refuse it rather than OOM the fleet.
#
# Past the threshold the same mention semantics come from the declarative
# first-token blocking join (mentions_via_join): the vocabulary stays a
# DataFrame (never driver-side), joins as a JVM broadcast while it fits
# the executor budget, and degrades to a shuffle join under AQE beyond
# that — unbounded vocabulary size at the cost of the explode + join
# instead of the fused C scan (~1.5-3x slower per page at bench shape,
# still corpus-scan-shaped: the corpus is read once either way).

#: phrases at or below this ride the broadcast C kernel; above, the
#: blocking join. ~100k phrases ~= 3 MB of pattern bytes ~= a few hundred
#: MB of automaton per worker process — conservative for local[32]'s 32
#: worker processes; raise it on clusters with one fat executor per host.
BROADCAST_MAX_PHRASES = 100_000

#: above this even the JVM broadcast of the phrase table is dropped and
#: the blocking join shuffles both sides (AQE re-plans from runtime sizes)
JOIN_BROADCAST_MAX_PHRASES = 5_000_000


def detect_mentions(
    pages_text: DataFrame,
    phrases: DataFrame,
    kernel: str = "auto",
    broadcast_max_phrases: int = BROADCAST_MAX_PHRASES,
    join_broadcast_max_phrases: int = JOIN_BROADCAST_MAX_PHRASES,
    n_phrases: int | None = None,
) -> DataFrame:
    """(url, text) × (uri, phrase) -> MENTIONS, choosing the
    implementation by vocabulary size (the gazetteer crossover above):
    the broadcast C kernel up to ``broadcast_max_phrases`` distinct
    (uri, phrase) rows, the first-token blocking join beyond — with its
    JVM broadcast hint kept while the vocabulary fits
    ``join_broadcast_max_phrases`` and dropped (AQE decides) past that.
    Both forms implement the identical matching contract
    (equivalence-pinned in tests/test_mentions.py), so the switch changes
    plan shape only, never output.

    ``n_phrases``: pass the known distinct-row count to skip the count
    job (pipelines that just built the vocabulary know it). For raw-HTML
    scans (mentions_from_html) past the threshold, extract text first
    (textnorm / pages stage) and route through this — the fused C path
    is broadcast-only by construction."""
    if n_phrases is None:
        n_phrases = phrases.select("uri", "phrase").distinct().count()
    if n_phrases <= broadcast_max_phrases:
        return mentions_via_trie(pages_text, phrases, kernel=kernel)
    return mentions_via_join(
        pages_text,
        phrases,
        broadcast_vocab=n_phrases <= join_broadcast_max_phrases,
    )


try:  # optional C automaton (pyahocorasick); absent in this container
    import ahocorasick as _ahocorasick

    _HAS_AHOCORASICK = True
except ImportError:  # pragma: no cover - exercised when the lib ships
    _ahocorasick = None
    _HAS_AHOCORASICK = False


def canonical_phrase_rows(
    phrase_rows: list[tuple[str, str]],
) -> list[tuple[str, str]]:
    """Shared kernel contract, applied by every scanner entry point:
    whitespace-canonicalize each phrase (``' '.join(split())``) and dedupe
    (uri, phrase) pairs. All kernels then match the canonical token
    sequence, emit the canonical surface, and count each key once —
    however duplicated or oddly-spaced the input was. ``label_phrases``
    output is already canonical (the golden normalize collapses
    whitespace), so the production path is unchanged; this pins the
    contract for arbitrary public-API input (ADVICE round 2)."""
    out: list[tuple[str, str]] = []
    seen: set = set()
    for uri, phrase in phrase_rows:
        p = " ".join(phrase.split())
        if p and (uri, p) not in seen:
            seen.add((uri, p))
            out.append((uri, p))
    return out


def _build_trie(phrase_rows: list[tuple[str, str]]) -> dict:
    """Token trie: token -> subtrie; terminal phrases under the '' key as
    a list of (uri, phrase)."""
    root: dict = {}
    for uri, phrase in phrase_rows:
        node = root
        for tok in phrase.split():
            node = node.setdefault(tok, {})
        node.setdefault("", []).append((uri, phrase))
    return root


def _build_blocked_index(phrase_rows: list[tuple[str, str]]) -> dict:
    """first_token -> [(" phrase ", (uri, phrase)), ...] for the blocked
    kernel: space-padded phrase strings make substring search token-exact
    (tokens contain no spaces after the golden normalize)."""
    index: dict = {}
    for uri, phrase in phrase_rows:
        toks = phrase.split()
        if toks:
            index.setdefault(toks[0], []).append(
                (" " + phrase + " ", (uri, phrase))
            )
    return index


def scan_tokens_blocked_py(index: dict, toks: list[str]) -> dict[tuple[str, str], int]:
    """Same contract as :func:`scan_tokens_py`, restructured so the hot
    loop runs in C: ``set(toks) & index`` prunes to phrases whose first
    token appears at all (the same blocking trick mentions_via_join uses
    declaratively), then each surviving phrase is counted with
    ``str.find`` stepping by one char so boundary-sharing overlapping
    occurrences each count ("a b" twice in "a b a b" — ``str.count``
    would miss the second, it resumes AFTER the shared space). Python
    bytecode cost is per candidate phrase + per occurrence, not per
    token position."""
    out: dict[tuple[str, str], int] = {}
    if not toks:
        return out
    cands = set(toks).intersection(index)
    if not cands:
        return out
    padded = " " + " ".join(toks) + " "
    find = padded.find
    for t in cands:
        for pp, key in index[t]:
            c = 0
            idx = find(pp)
            while idx != -1:
                c += 1
                idx = find(pp, idx + 1)
            if c:
                out[key] = out.get(key, 0) + c
    return out


def _build_automaton(phrase_rows: list[tuple[str, str]]):
    """pyahocorasick automaton over space-padded phrases; word value is
    the LIST of (uri, phrase) keys sharing that surface (add_word
    overwrites duplicates, and distinct uris can share a phrase)."""
    words: dict[str, list] = {}
    for uri, phrase in phrase_rows:
        if phrase.strip():
            words.setdefault(" " + phrase + " ", []).append((uri, phrase))
    if not words:
        return None  # iter() on a word-less automaton raises; scanner no-ops
    auto = _ahocorasick.Automaton()
    for w, keys in words.items():
        auto.add_word(w, keys)
    auto.make_automaton()
    return auto


def scan_tokens_automaton_py(auto, toks: list[str]) -> dict[tuple[str, str], int]:
    """Aho-Corasick kernel: one C pass over the padded text; ``iter``
    reports every (overlapping) occurrence of every padded phrase."""
    out: dict[tuple[str, str], int] = {}
    if not toks or auto is None:
        return out
    for _end, keys in auto.iter(" " + " ".join(toks) + " "):
        for key in keys:
            out[key] = out.get(key, 0) + 1
    return out


def _native_available() -> bool:
    try:
        from ontology_mapping_spark.native import load_acscan

        return load_acscan() is not None
    except Exception:
        return False


# per-worker-process cache of built native automatons, keyed by broadcast
# id (a ctypes automaton is not picklable, so it must be built executor-
# side from the broadcast phrase rows — once per worker, not per task)
_NATIVE_MATCHERS: dict = {}


def _resolve_kernel(kernel: str) -> str:
    if kernel != "auto":
        return kernel
    if _HAS_AHOCORASICK:
        return "ahocorasick"
    if _native_available():
        return "cnative"
    return "trie"


def _mint_scanner_key(prefix: str) -> str:
    """Worker-side Broadcast objects expose no id — mint the cache key
    driver-side and ship it in the closure (unique per scanner)."""
    import itertools
    import os as _os

    if not hasattr(_mint_scanner_key, "_seq"):
        _mint_scanner_key._seq = itertools.count()
    return f"{prefix}-{_os.getpid()}-{next(_mint_scanner_key._seq)}"


def _cached_matcher(bc, cache_key: str):
    """Build-once-per-worker matcher over broadcast phrase rows, degrading
    to the pure-Python trie walker on hosts without a C compiler
    (heterogeneous cluster). Eviction is pop-OLDEST at 8 entries
    (insertion-ordered dict = FIFO), so a newly built entry can never
    evict itself under churn."""
    m = _NATIVE_MATCHERS.get(cache_key)
    if m is None:
        try:
            from ontology_mapping_spark.native import NativeMatcher

            m = NativeMatcher(bc.value)
        except Exception:
            m = _TrieMatcher(_build_trie(bc.value))
        while len(_NATIVE_MATCHERS) >= 8:
            _NATIVE_MATCHERS.pop(next(iter(_NATIVE_MATCHERS)))
        _NATIVE_MATCHERS[cache_key] = m
    return m


def make_token_scanner(spark, phrase_rows: list[tuple[str, str]], kernel: str = "auto"):
    """Build-once-per-executor scanner: returns scan(toks) -> counts.

    ``kernel``:

    * "auto" — "ahocorasick" (pyahocorasick) when that library ships,
      else "cnative" when a C compiler is available (the repo's own
      Aho-Corasick in native/acscan.c, compiled once per host and cached),
      else "trie".
    * "trie" — the per-token dict walker, the reference implementation the
      C kernels are equivalence-tested against. Pure Python, always works.
    * "cnative" / "ahocorasick" — one C pass over the padded page text.
    * "blocked" — opt-in first-token-pruned str.find kernel; measured
      SLOWER on the dense-mention fixture workload (5.9k vs 41k pages/s
      single-threaded: its cost is O(candidate phrases × page chars) vs
      the trie's O(token positions)); wins only on long pages with rare
      page-vocabulary overlap.

    Pure-Python structures ride a Spark broadcast (deserialized once per
    executor); the cnative automaton is rebuilt from broadcast rows once
    per worker process and falls back to the trie if the target host has
    no compiler. Every kernel sees :func:`canonical_phrase_rows` input."""
    kernel = _resolve_kernel(kernel)
    phrase_rows = canonical_phrase_rows(phrase_rows)
    if kernel == "ahocorasick":
        if not _HAS_AHOCORASICK:
            raise ImportError("pyahocorasick not available; use kernel='cnative'")
        bc = spark.sparkContext.broadcast(_build_automaton(phrase_rows))
        return lambda toks: scan_tokens_automaton_py(bc.value, toks)
    if kernel == "cnative":
        bc = spark.sparkContext.broadcast(phrase_rows)
        cache_key = _mint_scanner_key("cnative")
        return lambda toks: _cached_matcher(bc, cache_key).scan_tokens(toks)
    if kernel == "blocked":
        bc = spark.sparkContext.broadcast(_build_blocked_index(phrase_rows))
        return lambda toks: scan_tokens_blocked_py(bc.value, toks)
    if kernel == "trie":
        bc = spark.sparkContext.broadcast(_build_trie(phrase_rows))
        return lambda toks: scan_tokens_py(bc.value, toks)
    raise ValueError(f"unknown kernel {kernel!r}")


class _TrieMatcher:
    """Adapter giving the trie walker the NativeMatcher interface."""

    def __init__(self, trie):
        self._trie = trie

    def scan_tokens(self, toks):
        return scan_tokens_py(self._trie, toks)


def make_batch_scanner(spark, phrase_rows: list[tuple[str, str]], kernel: str = "auto"):
    """Batch-shaped scanner for the Arrow emitters: returns
    scan_batch(token_lists) -> (page_idx array, keys-per-hit, counts) over
    unique (page, pattern) pairs. The cnative kernel serves this with ONE
    C call per Arrow batch (the per-page Python->C transition was the
    2x overhead that made the naive per-page C path slower than the trie
    on short pages — measured in BENCH.md); every other kernel emulates
    the shape with a per-page loop over the scalar scanner."""
    kernel = _resolve_kernel(kernel)
    if kernel == "cnative":
        bc = spark.sparkContext.broadcast(canonical_phrase_rows(phrase_rows))
        cache_key = _mint_scanner_key("cnative-batch")

        def scan_batch(token_lists):
            m = _cached_matcher(bc, cache_key)
            if hasattr(m, "scan_batch_flat"):
                return m.scan_batch_flat(token_lists)
            return _emulate_batch(m.scan_tokens, token_lists)

        return scan_batch
    scan_toks = make_token_scanner(spark, phrase_rows, kernel)
    return lambda token_lists: _emulate_batch(scan_toks, token_lists)


def make_hits_scanner(spark, phrase_rows: list[tuple[str, str]], kernel: str = "auto"):
    """The fused-fold scan entry point: returns
    ``scan_texts(texts: list[bytes]) -> (page_sel, uris, surfaces, n_hits)``
    with one row per (page, uri, surface) hit — ``page_sel``/``n_hits``
    NumPy int64, ``uris``/``surfaces`` Arrow string arrays ready for
    RecordBatch assembly. Feed it :func:`textnorm.foldable_text_py` /
    :func:`textnorm.foldable_text_from_html_py` bytes.

    With the cnative kernel the ENTIRE per-page path — case-fold,
    tokenize, match — is one C call per batch (``ac_scan_multi_fold_agg``)
    plus vectorized NumPy/Arrow key fan-out; no per-page or per-hit
    Python. Other kernels (or compiler-less hosts) tokenize in Python and
    loop the scalar scanner — same results, tested equal."""
    kernel = _resolve_kernel(kernel)
    if kernel == "cnative":
        bc = spark.sparkContext.broadcast(canonical_phrase_rows(phrase_rows))
        cache_key = _mint_scanner_key("cnative-hits")

        def scan_texts(texts):
            m = _cached_matcher(bc, cache_key)
            if hasattr(m, "scan_batch_hits_text"):
                return m.expand_hits(*m.scan_batch_hits_text(texts))
            return _emulate_hits(m.scan_tokens, texts)

        return scan_texts
    scan_toks = make_token_scanner(spark, phrase_rows, kernel)
    return lambda texts: _emulate_hits(scan_toks, texts)


def make_html_hits_scanner(spark, phrase_rows: list[tuple[str, str]], kernel: str = "auto"):
    """RAW-HTML scan entry point: returns ``scan_html(col) -> (page_sel,
    uris, surfaces, n_hits)`` where ``col`` is a pyarrow binary/string
    Array (or list of bytes) of raw page HTML.

    With the cnative kernel + entity table, extraction ITSELF moves into
    C: comment strip, boilerplate strip, tag strip, ``html.unescape``
    (longest-prefix named entities + numeric charrefs, tables generated
    from this interpreter's ``html`` module), case-fold, tokenize, and
    match run as ONE C call per Arrow batch, reading the page bytes
    zero-copy from the Arrow buffer. Per-page Python work: none.
    Ambiguous pages (non-ASCII in a boiler-name window, U+0130/U+212A,
    ``&Idot;``) are flagged by the C pass and re-run through the Python
    extraction path, so output always equals the Python pipeline's
    (equivalence pinned in tests/test_mentions.py + hypothesis).
    Other kernels extract in Python (textnorm.foldable_text_from_html_py)
    and reuse :func:`make_hits_scanner` — same results, tested equal."""
    kernel = _resolve_kernel(kernel)
    if kernel == "cnative":
        bc = spark.sparkContext.broadcast(canonical_phrase_rows(phrase_rows))
        cache_key = _mint_scanner_key("cnative-html")

        def scan_html(col):
            m = _cached_matcher(bc, cache_key)
            if hasattr(m, "scan_batch_hits_html") and m.supports_html():
                return m.expand_hits(*m.scan_batch_hits_html(col))
            return _emulate_html_hits(m, col)

        return scan_html
    scan_texts = make_hits_scanner(spark, phrase_rows, kernel)

    def scan_html_fallback(col):
        from ontology_mapping_spark.textnorm import foldable_text_from_html_py

        htmls = col.to_pylist() if hasattr(col, "to_pylist") else col
        return scan_texts([foldable_text_from_html_py(h) for h in htmls])

    return scan_html_fallback


def _emulate_html_hits(m, col):
    """Heterogeneous-host fallback for the html scanner (no C entity
    table / trie matcher): Python extraction, then whichever batch-text
    capability the matcher has."""
    from ontology_mapping_spark.textnorm import foldable_text_from_html_py

    htmls = col.to_pylist() if hasattr(col, "to_pylist") else col
    texts = [foldable_text_from_html_py(h) for h in htmls]
    if hasattr(m, "scan_batch_hits_text"):
        return m.expand_hits(*m.scan_batch_hits_text(texts))
    return _emulate_hits(m.scan_tokens, texts)


def _emulate_hits(scan_toks, texts):
    """Python fallback for :func:`make_hits_scanner`: byte-decode +
    tokenize per page, scalar scan, same flat shape. Fold-safe raw bytes
    tokenize identically to the C fold; non-fold-safe pages arrive
    pre-tokenized ascii (textnorm.foldable_text_py), for which
    _tokens_from_text is the identity split."""
    import numpy as np
    import pyarrow as pa

    from ontology_mapping_spark.textnorm import _tokens_from_text

    page_idx, uris, surfaces, counts = [], [], [], []
    for i, tb in enumerate(texts):
        toks = _tokens_from_text(tb.decode("utf-8", errors="replace"))
        for (uri, phrase), c in scan_toks(toks).items():
            page_idx.append(i)
            uris.append(uri)
            surfaces.append(phrase)
            counts.append(c)
    return (
        np.asarray(page_idx, dtype=np.int64),
        pa.array(uris, type=pa.string()),
        pa.array(surfaces, type=pa.string()),
        np.asarray(counts, dtype=np.int64),
    )


def _emulate_batch(scan_toks, token_lists):
    page_idx, keys, counts = [], [], []
    for i, toks in enumerate(token_lists):
        for key, c in scan_toks(toks).items():
            page_idx.append(i)
            keys.append([key])
            counts.append(c)
    return page_idx, keys, counts


def scan_tokens_py(trie: dict, toks: list[str]) -> dict[tuple[str, str], int]:
    """Count matches of every trie phrase in a token stream. At each token
    position, walk the trie as far as tokens match, emitting every terminal
    passed (so nested phrases all fire). Counts are per START POSITION —
    overlapping occurrences of a self-overlapping phrase each count
    (matches phrase_hit_count_expr and the pytest oracle)."""
    out: dict[tuple[str, str], int] = {}
    n = len(toks)
    for i in range(n):
        node = trie
        j = i
        while j < n and toks[j] in node:
            node = node[toks[j]]
            j += 1
            for hit in node.get("", []):
                out[hit] = out.get(hit, 0) + 1
    return out


def _emit_batch(urls: list, uris: list, surfaces: list, counts: list):
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(uris, type=pa.string()),
            pa.array(surfaces, type=pa.string()),
            pa.array(counts, type=pa.int32()),
        ],
        names=["url", "uri", "surface", "n_hits"],
    )


def _emit_hits(url_col, page_sel, uris, surfaces, n_hits):
    """Assemble the MENTIONS RecordBatch from flat hit arrays with Arrow
    take — no per-hit Python."""
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [
            url_col.take(pa.array(page_sel, type=pa.int64())),
            uris,
            surfaces,
            pa.array(n_hits, type=pa.int32()),
        ],
        names=["url", "uri", "surface", "n_hits"],
    )


def mentions_via_trie(
    pages_text: DataFrame,
    phrases: DataFrame,
    batch_hint: int | None = None,
    kernel: str = "auto",
) -> DataFrame:
    """Broadcast-vocabulary scan inside mapInArrow (the matcher structure
    is built once per executor from a broadcast variable, not per batch).
    Arrow batches are consumed/produced directly — the pandas conversion
    of a binary/string column costs ~2x the whole scan kernel (measured),
    so mapInPandas is the wrong shape here. With the cnative kernel the
    per-page work is one fold+tokenize+match C call per batch
    (textnorm.foldable_text_py routes the two non-fold-safe code points
    through the Python tokenizer); results expand to rows via vectorized
    NumPy/Arrow, not per-hit appends. ``kernel`` picks the matcher (see
    :func:`make_token_scanner`); all kernels are equivalence-tested
    against the token-trie walker."""
    from ontology_mapping_spark.textnorm import foldable_text_py

    spark = pages_text.sparkSession
    rows = [(r["uri"], r["phrase"]) for r in phrases.select("uri", "phrase").collect()]
    scan_texts = make_hits_scanner(spark, rows, kernel)

    def scan(batches):
        for b in batches:
            texts = [foldable_text_py(t) for t in b.column("text").to_pylist()]
            yield _emit_hits(b.column("url"), *scan_texts(texts))

    return pages_text.select("url", "text").mapInArrow(scan, schema=MENTIONS)


def mentions_from_html(
    pages: DataFrame,
    phrases: DataFrame,
    lang: str | None = "en",
    kernel: str = "auto",
) -> DataFrame:
    """Fused S1+S3: HTML extraction + vocabulary scan in ONE Arrow pass
    per batch (url, html) -> (url, uri, surface, n_hits). Halves the
    JVM<->Python crossings vs extract-then-scan. With the cnative kernel
    + entity table, the ENTIRE per-page path — comment/boilerplate/tag
    strip, entity decode, case-fold, tokenize, match — is one C call per
    batch consuming the page bytes zero-copy from the Arrow buffer
    (make_html_hits_scanner); per-page Python work is zero on the
    overwhelmingly-common unflagged pages, and hit rows are assembled
    with vectorized NumPy/Arrow. Other kernels extract per page in
    Python (textnorm.foldable_text_from_html_py) — same results,
    equivalence-pinned in tests/test_mentions.py. The production shape
    for the 100 TB pages scan — each page crosses into Python exactly
    once (cnative: zero times, page bytes never materialize as Python
    objects). ``kernel`` as in :func:`make_token_scanner`."""
    spark = pages.sparkSession
    rows = [(r["uri"], r["phrase"]) for r in phrases.select("uri", "phrase").collect()]
    scan_html = make_html_hits_scanner(spark, rows, kernel)

    def scan(batches):
        for b in batches:
            yield _emit_hits(b.column("url"), *scan_html(b.column("html")))

    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    return df.select("url", "html").mapInArrow(scan, schema=MENTIONS)


def mention_triples(mentions: DataFrame, predicate: str = "kg:mentionedIn") -> DataFrame:
    """Mentions -> (subject=concept, predicate, object=url) triples in the
    reference's Subject/Predicate/Object shape
    (thesis/process_data_features.py:101)."""
    return mentions.select(
        F.col("uri").alias("subject"),
        F.lit(predicate).alias("predicate"),
        F.col("url").alias("object"),
    ).distinct()
