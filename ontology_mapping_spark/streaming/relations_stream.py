"""Stateless Structured-Streaming relation extraction.

Batch relation extraction (operators/relations.py) groups mentions per
sentence — a shuffle aggregate that in a stream would be STATEFUL over an
unbounded (url, sent_id) key space. This module keeps the stream
stateless instead: the ontology-sized vocabulary rides as a LITERAL array
(the broadcast-as-literal precedent of the LSH hyperplanes,
operators/similarity.py), so sentence split, mention scan and the typed
pair algebra are all within-row projections — the only stateful operator
is the optional windowed count, bounded by its watermark.

The pair algebra itself is the SHARED expression
``operators/relations.typed_triples_expr`` — batch and streaming cannot
drift. The within-row mention scan (`sentence_mentions_expr`) is
O(|vocab|) instr calls per sentence, which is the right trade for a
micro-batch stream over an ontology-sized vocabulary; the batch path
keeps the token-blocked broadcast join for full-corpus scans.

* :func:`relation_vocab_literal` — static (uri, phrase) DataFrame ->
  literal array column (collected once, driver-side; ontology-sized by
  contract).
* :func:`stream_relation_triples` — page stream -> (url, warc_ts, subj,
  pred, obj) typed triples, append-mode, zero state.
* :func:`stream_relation_counts` — watermarked event-time windowed
  support counts per (subj, pred, obj) — the streaming twin of the batch
  aggregate's n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.operators.relations import (
    DEFAULT_PATTERNS,
    fold_sentence,
    sentence_mentions_expr,
    typed_triples_expr,
)
from ontology_mapping_spark.sources.pages import extract_text_udf


def relation_vocab_literal(phrases: DataFrame) -> Column:
    """Collect a static (uri, phrase) DataFrame into a literal
    array<struct<uri,phrase>> column. Driver-side collect is by contract
    bounded (the ontology vocabulary); phrases must arrive pre-folded,
    exactly as for operators/relations.sentence_mentions."""
    rows = (
        phrases.select("uri", "phrase").dropDuplicates().collect()
    )
    return F.array(
        *[
            F.struct(F.lit(r["uri"]).alias("uri"), F.lit(r["phrase"]).alias("phrase"))
            for r in sorted(rows, key=lambda r: (r["uri"], r["phrase"]))
        ]
    )


def stream_relation_triples(
    pages_stream: DataFrame,
    phrases: DataFrame,
    patterns: dict[str, str] | None = None,
    lang: str | None = "en",
) -> DataFrame:
    """(url, warc_ts, subj, pred, obj) typed relation triples from a
    web_pages stream — fully stateless (append mode, no watermark
    needed): extraction, sentence split, mention scan and pair typing are
    projections/generators; per-sentence dedup is the same
    array_distinct as the batch path."""
    patterns = DEFAULT_PATTERNS if patterns is None else patterns
    vocab = relation_vocab_literal(phrases)
    df = pages_stream
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    sentences = (
        df.select(
            "url",
            "warc_ts",
            F.explode(
                F.split(extract_text_udf(F.col("html")), r"(?<=[.!?])\s+")
            ).alias("sentence"),
        )
        .filter(F.trim(F.col("sentence")) != "")
        # project the folded padded text ONCE; the mention scan and the
        # between-text substr both read this column
        .select(
            "url",
            "warc_ts",
            F.concat(F.lit(" "), fold_sentence("sentence"), F.lit(" ")).alias(
                "padded"
            ),
        )
    )
    padded = F.col("padded")
    triples = typed_triples_expr(
        sentence_mentions_expr(padded, vocab), padded, patterns
    )
    return sentences.select(
        "url", "warc_ts", F.explode(triples).alias("t")
    ).select(
        "url",
        "warc_ts",
        F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
    )


def stream_relation_counts(
    rel_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time windowed support counts — the streaming
    twin of the batch aggregate's n (state bounded by the watermark)."""
    return (
        rel_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "subj", "pred", "obj")
        .agg(F.count("*").alias("n"))
    )
