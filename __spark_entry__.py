"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship mention-detection query on sf0.001;
``queries``/``oracle_sql`` expose the full operator catalog from
``ontology_mapping_spark.queries`` (each Spark implementation is built from
the engine's operators; each oracle is ANSI SQL DuckDB runs on the same
parquet views).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the package must be importable by Spark's Python workers (pandas UDFs are
# serialized by module reference) — the local analog of --py-files
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    else os.environ["PYTHONPATH"]
)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from ontology_mapping_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: mention detection over the documents corpus at sf0.001 —
    derive a phrase vocabulary (frequent bigrams), emit (doc_id, phrase)
    mentions via the token-blocking pattern (SURVEY §7 minimum slice)."""
    return _q.registry()["mention_detection_flagship"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # curated <= 50 entries, one per operator family: the driver's gate
    # checks at most 50 catalog rows, and an oversized catalog silently
    # drops the tail (round-2 lesson). Redundant variants stay in
    # ontology_mapping_spark.queries.registry() and are value-checked by
    # the local gate (tools/check_queries.py).
    return _q.curated_registry()


def oracle_sql() -> dict[str, str]:
    return _q.curated_oracles()
