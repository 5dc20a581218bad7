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
