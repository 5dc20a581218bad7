"""Structured-Streaming mention extraction.

The reference is pure batch (SURVEY.md §2.8) and the north rule's resume
story is stage-boundary checkpointing, not streaming — but a web-crawl
pipeline's natural ingest is a stream of page files. This module runs the
SAME mention operators over ``readStream``: the phrase table is a static
broadcast side (stream-static joins are stateless and fully supported), so
batch and streaming share one code path and one semantics.

* :func:`stream_pages` — file-source stream of web_pages parquet drops.
* :func:`stream_mentions` — extraction + the declarative blocking-join
  mention detector on the stream (stream-static broadcast join; no
  watermark needed — the operator is stateless).
* :func:`stream_mention_counts` — windowed per-concept mention counts with
  a watermark (the one stateful aggregation: event-time window on warc_ts,
  late data bounded by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontology_mapping_spark.schemas import WEB_PAGES
from ontology_mapping_spark.sources.pages import extract_text_udf


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(WEB_PAGES)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def stream_mentions(
    pages_stream: DataFrame, phrases: DataFrame, lang: str | None = "en"
) -> DataFrame:
    """(url, warc_ts, uri, surface, n_hits) streaming mentions; ``phrases``
    is a static (uri, phrase) DataFrame (broadcast side of the
    stream-static join).

    Same logic as mentions_via_join (operators/mentions.py) with warc_ts
    carried through; the blocking-join pieces (phrase token table, hit-count
    expression) are the SHARED helpers from operators/mentions.py so batch
    and streaming cannot drift apart. Page tokens are distinct per url, so
    the first-token join yields at most one row per (url, phrase) and no
    stateful dedup is needed.
    """
    from ontology_mapping_spark.operators.mentions import (
        phrase_hit_count_expr,
        phrase_token_table,
    )
    from ontology_mapping_spark.textnorm import normalize_col

    df = pages_stream
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    pages_text = df.select(
        "url", "warc_ts", extract_text_udf(F.col("html")).alias("text")
    )
    toks = pages_text.select(
        "url", "warc_ts", F.split(normalize_col("text"), " ").alias("toks")
    )
    page_tokens = toks.select(
        "url", "warc_ts", "toks", F.explode(F.array_distinct("toks")).alias("token")
    )
    hits = (
        page_tokens.join(F.broadcast(phrase_token_table(phrases)), "token")
        .withColumn("n_hits", phrase_hit_count_expr())
        .filter(F.col("n_hits") > 0)
    )
    return hits.select(
        "url", "warc_ts", "uri", F.col("phrase").alias("surface"), "n_hits"
    )


def stream_mention_counts(
    mentions: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Windowed per-concept counts with late-data handling."""
    return (
        mentions.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "uri")
        .agg(F.sum("n_hits").alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "uri",
            "n_mentions",
        )
    )


def run_stream_to_parquet(
    spark: SparkSession,
    input_dir: str,
    phrases: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Wire the stream to a parquet sink with checkpointing; returns the
    StreamingQuery (caller awaits/stops)."""
    m = stream_mentions(stream_pages(spark, input_dir), phrases)
    return (
        m.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_concept_milestones(
    mentions: DataFrame, milestones: tuple[int, ...] = (1, 10, 100, 1000, 10000)
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-concept
    cumulative mention totals carried across microbatches, emitting a row
    each time a concept's lifetime count crosses a milestone.

    Not expressible as a windowed aggregation: the state is a lifetime
    running total (no window bound) and the output is the *crossing event*,
    not the aggregate. This is the ``applyInPandasWithState`` pattern for
    arbitrary stateful logic (threshold alerts, change-points, session
    models) the brief's streaming surface calls for. State is one long per
    key — bounded by |ontology|, not by stream length.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    ms = sorted(milestones)

    def fn(key, pdfs, state):
        prev = state.get[0] if state.exists else 0
        add = 0
        for pdf in pdfs:
            add += int(pdf["n_hits"].sum())
        total = prev + add
        state.update((total,))
        crossed = [m for m in ms if prev < m <= total]
        if crossed:
            yield pd.DataFrame(
                {
                    "uri": [key[0]] * len(crossed),
                    "milestone": crossed,
                    "total": [total] * len(crossed),
                }
            )

    return (
        mentions.select("uri", "n_hits")
        .groupBy("uri")
        .applyInPandasWithState(
            fn,
            outputStructType="uri string, milestone long, total long",
            stateStructType="total long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
