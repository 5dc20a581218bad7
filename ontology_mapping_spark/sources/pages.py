"""web_pages source stage: scan + HTML -> text extraction.

The reference's inputs are OWL files (thesis/main.py:40-41); the north-star
input is the Common-Crawl-style ``web_pages`` table (BASELINE.json
input_hint). Extraction is a vectorized pandas UDF wrapping the pure
function :func:`ontology_mapping_spark.textnorm.extract_text_py`, so the
"byte-identical extracted text per url" invariant holds by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ontology_mapping_spark.textnorm import extract_text_py


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return pd.Series([extract_text_py(h) for h in html.tolist()])


def extracted_pages(pages: DataFrame, lang: str | None = "en") -> DataFrame:
    """(url, warc_ts, html, text, lang) -> (url, text) with text extracted
    from html. Language filter first (partition-prunable at scale when the
    table is partitioned by lang)."""
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    return df.select("url", extract_text_udf(F.col("html")).alias("text"))
