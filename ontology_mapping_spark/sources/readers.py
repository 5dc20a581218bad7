"""Typed readers for the reference's file inputs — schema inference banned.

* :func:`read_alignments` — the OAEI TSV shape (thesis/main.py:53,60:
  ``pd.read_csv(path, sep="\\t")``) with the derived Label column
  (``Score == 1.0``, thesis/main.py:54) and positive filter.
* :func:`read_csv` — generic explicit-schema CSV (thesis/clustering.py:12).
* :func:`mint_uri` — deterministic content-addressed id (sha2 over the
  natural key) replacing the reference's ``uuid.uuid4`` label URIs
  (thesis/pre_processing_data.py:70,114,118) — uuid4 breaks resumability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ontology_mapping_spark.schemas import ALIGNMENTS


def read_alignments(
    spark: SparkSession, path: str, positives_only: bool = False
) -> DataFrame:
    df = (
        spark.read.options(sep="\t", header=True)
        .schema(ALIGNMENTS)
        .csv(path)
        .withColumn("Label", (F.col("Score") == 1.0).cast("int"))
    )
    if positives_only:
        df = df.filter(F.col("Label") == 1).select("SrcEntity", "TgtEntity")
    return df


def read_csv(spark: SparkSession, path: str, schema: T.StructType, **options) -> DataFrame:
    return spark.read.options(**{"header": True, **options}).schema(schema).csv(path)


#: web_pages physical layout (BASELINE.json input_hint): partitioned by
#: language then crawl day. Cardinality is bounded (langs x days), so no
#: partition explosion; lang is first because the pipeline's hottest
#: predicate is the per-language run.
PAGES_PARTITION_COLS = ("lang", "p_date")


def write_pages_partitioned(
    pages: DataFrame, path: str, mode: str = "overwrite", files_per_partition: int = 1
) -> None:
    """Write the ``web_pages`` table partitioned by ``(lang, p_date)``.

    This is the 100 TB scan-pruning contract: a lang-filtered pipeline run
    lists and reads ONLY the ``lang=<x>/`` directories, and a crawl-date
    range prunes to its day partitions — both enforced by
    tests/test_pages_partitioning.py against ``input_file_name()`` and the
    physical plan's PartitionFilters.

    The pre-write ``repartition`` on the partition columns gives each
    (lang, day) one writer task — no tiny-file explosion from every task
    writing every partition. At real scale a single day of one language
    exceeds one task's output: raise ``files_per_partition`` to split each
    partition across N writer tasks (url-hash salt, deterministic)."""
    keys = [F.col("lang"), F.col("p_date")]
    if files_per_partition > 1:
        keys.append(F.pmod(F.xxhash64("url"), F.lit(files_per_partition)))
    (
        pages.withColumn("p_date", F.to_date("warc_ts"))
        .repartition(*keys)
        .write.mode(mode)
        .partitionBy(*PAGES_PARTITION_COLS)
        .parquet(path)
    )


def read_pages(
    spark: SparkSession,
    path: str,
    lang: str | None = None,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """Read ``web_pages`` back in input_hint column order, with optional
    partition-pruning predicates (plain filters on partition columns —
    Catalyst turns them into PartitionFilters, so pruning happens at file
    listing, before any IO)."""
    df = spark.read.parquet(path)
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    if start_date is not None:
        df = df.filter(F.col("p_date") >= F.lit(start_date).cast("date"))
    if end_date is not None:
        df = df.filter(F.col("p_date") <= F.lit(end_date).cast("date"))
    return df.select("url", "warc_ts", "html", "text", "lang")


def mint_uri(prefix: str, *cols: Column | str, length: int = 40) -> Column:
    """Deterministic URI: prefix + sha2(natural key). Same inputs -> same id
    on every run and every cluster.

    The key encoding is injective: each part is length-prefixed
    (``len:value``) and nulls encode as a bare ``N``, so neither embedded
    delimiters ('a|b','c' vs 'a','b|c') nor dropped nulls ('a',null,'b' vs
    'a','b') can make two distinct natural keys mint the same id — the
    exact duplicate-identity bug content-addressed minting must prevent."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    encoded = [
        F.when(p.isNull(), F.lit("N")).otherwise(
            F.concat(F.length(p).cast("string"), F.lit(":"), p)
        )
        for p in parts
    ]
    return F.concat(
        F.lit(prefix), F.substring(F.sha2(F.concat_ws("|", *encoded), 256), 1, length)
    )
