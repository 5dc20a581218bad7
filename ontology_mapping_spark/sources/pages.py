"""web_pages source stage: scan + HTML -> text extraction.

The reference's inputs are OWL files (thesis/main.py:40-41); the north-star
input is the Common-Crawl-style ``web_pages`` table (BASELINE.json
input_hint). Both extraction forms wrap the pure function
:func:`ontology_mapping_spark.textnorm.extract_text_py`, so the
"byte-identical extracted text per url" invariant holds by construction:

* :func:`extracted_pages` — mapInArrow batch stage (the fast shape: the
  pandas conversion of a binary column costs ~2x the kernel, see BENCH.md);
* :func:`extract_text_udf` — scalar pandas UDF, kept for column-position
  use (e.g. the streaming projection that carries warc_ts through).
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
    import pyarrow as pa

    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)

    def ex(batches):
        for b in batches:
            urls = b.column("url").to_pylist()
            texts = [extract_text_py(h) for h in b.column("html").to_pylist()]
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, type=pa.string()), pa.array(texts, type=pa.string())],
                names=["url", "text"],
            )

    return df.select("url", "html").mapInArrow(ex, "url string, text string")
