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
from ontology_mapping_spark.textnorm import normalize_col, normalize_py


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


def mentions_via_join(pages_text: DataFrame, phrases: DataFrame) -> DataFrame:
    """(url, text) × (uri, phrase) -> (url, uri, surface, n_hits).

    Blocking: a page can only contain a phrase if it contains the phrase's
    first token, so join exploded distinct page tokens to phrase first
    tokens (broadcast — the ontology is the small side), then verify
    containment on the padded normalized text. Everything is JVM built-ins;
    the phrase list never leaves the JVM.
    """
    norm_pages = pages_text.select(
        "url", F.split(normalize_col("text"), " ").alias("toks")
    )
    page_tokens = norm_pages.select(
        "url", "toks", F.explode(F.array_distinct("toks")).alias("token")
    )
    joined = page_tokens.join(F.broadcast(phrase_token_table(phrases)), "token")
    hits = joined.withColumn("n_hits", phrase_hit_count_expr()).filter(
        F.col("n_hits") > 0
    )
    return hits.select(
        "url", "uri", F.col("phrase").alias("surface"), "n_hits"
    ).distinct()


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


def scan_text_py(trie: dict, text: str) -> dict[tuple[str, str], int]:
    """:func:`scan_tokens_py` over golden-normalized text."""
    return scan_tokens_py(trie, normalize_py(text).split())


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


def mentions_via_trie(
    pages_text: DataFrame, phrases: DataFrame, batch_hint: int | None = None
) -> DataFrame:
    """Broadcast-trie scan inside mapInArrow (the trie is built once per
    executor from a broadcast variable, not per batch). Arrow batches are
    consumed/produced directly — the pandas conversion of a binary/string
    column costs ~2x the whole scan kernel (measured), so mapInPandas is
    the wrong shape here."""
    spark = pages_text.sparkSession
    rows = [(r["uri"], r["phrase"]) for r in phrases.select("uri", "phrase").collect()]
    trie_bc = spark.sparkContext.broadcast(_build_trie(rows))

    def scan(batches):
        trie = trie_bc.value
        for b in batches:
            urls, uris, surfaces, counts = [], [], [], []
            for url, text in zip(
                b.column("url").to_pylist(), b.column("text").to_pylist()
            ):
                for (uri, phrase), c in scan_text_py(trie, text).items():
                    urls.append(url)
                    uris.append(uri)
                    surfaces.append(phrase)
                    counts.append(c)
            yield _emit_batch(urls, uris, surfaces, counts)

    return pages_text.select("url", "text").mapInArrow(scan, schema=MENTIONS)


def mentions_from_html(
    pages: DataFrame, phrases: DataFrame, lang: str | None = "en"
) -> DataFrame:
    """Fused S1+S3: HTML extraction + trie scan in ONE Arrow pass per batch
    (url, html) -> (url, uri, surface, n_hits). Halves the JVM<->Python
    crossings vs extract-then-scan, and tokenizes with the fused
    single-findall kernel (textnorm.tokens_from_html_py); the production
    shape for the 100 TB pages scan — each page crosses into Python exactly
    once."""
    from ontology_mapping_spark.textnorm import tokens_from_html_py

    spark = pages.sparkSession
    rows = [(r["uri"], r["phrase"]) for r in phrases.select("uri", "phrase").collect()]
    trie_bc = spark.sparkContext.broadcast(_build_trie(rows))

    def scan(batches):
        trie = trie_bc.value
        for b in batches:
            urls, uris, surfaces, counts = [], [], [], []
            for url, html in zip(
                b.column("url").to_pylist(), b.column("html").to_pylist()
            ):
                for (uri, phrase), c in scan_tokens_py(
                    trie, tokens_from_html_py(html)
                ).items():
                    urls.append(url)
                    uris.append(uri)
                    surfaces.append(phrase)
                    counts.append(c)
            yield _emit_batch(urls, uris, surfaces, counts)

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
