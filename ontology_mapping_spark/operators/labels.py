"""Ontology label + hierarchy extraction from the flat ``triples`` table.

Re-expresses thesis/process_data_features.py:
* ``extract_labels`` (:12-24)  — dict uri -> [prefLabel, synonyms...] built by
  two triple-pattern scans. Here: predicate filters + groupBy/collect.
  Determinism note: the reference keeps the *last* rdfs:label per subject in
  rdflib iteration order (order-dependent); the engine canonicalizes to
  sorted prefLabels first, then sorted synonyms.
* ``extract_hierarchy`` (:98-102) — subClassOf triples as (child, parent)
  edges (the reference's Subject/Predicate/Object dicts with "broader").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig


def extract_labels(
    triples: DataFrame, cfg: PipelineConfig | None = None, side: str | None = None
) -> DataFrame:
    """triples -> (uri, labels array<string>, side).

    Labels are lowercased + trimmed (reference: ``str(o).strip().lower()``,
    thesis/process_data_features.py:15,18,20); prefLabels sort before
    synonyms, each group sorted lexicographically (canonical order).
    """
    cfg = cfg or PipelineConfig()
    p = cfg.predicates
    tagged = (
        triples.filter(F.col("predicate").isin(p["label"], p["synonym"]))
        .select(
            F.col("subject").alias("uri"),
            F.struct(
                F.when(F.col("predicate") == p["label"], F.lit(0))
                .otherwise(F.lit(1))
                .alias("kind"),
                # regexp trim, not F.trim: labels in real RDF literals
                # carry tab/newline padding, and the pure-Python oracle
                # strips all whitespace (str.strip), not just spaces
                F.lower(
                    F.regexp_replace(F.col("object"), r"^\s+|\s+$", "")
                ).alias("val"),
            ).alias("lab"),
        )
    )
    out = tagged.groupBy("uri").agg(
        F.transform(F.array_sort(F.collect_list("lab")), lambda s: s["val"]).alias(
            "labels"
        )
    )
    return out.withColumn("side", F.lit(side)) if side else out.withColumn(
        "side", F.split(F.col("uri"), ":")[0]
    )


def extract_hierarchy(triples: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """triples -> (child, parent) edges; child `broader` parent.

    (Reference emits {"Subject": s, "Predicate": "broader", "Object": o} per
    subClassOf triple, thesis/process_data_features.py:98-102, then builds
    edges parent->child at :112-115.)
    """
    cfg = cfg or PipelineConfig()
    return (
        triples.filter(F.col("predicate") == cfg.predicates["subclass"])
        .select(F.col("subject").alias("child"), F.col("object").alias("parent"))
        .distinct()
    )


def label_text(labels: DataFrame) -> DataFrame:
    """(uri, labels, side) -> (uri, side, text) with text =
    normalize(' '.join(labels)) — the string every lexical feature consumes
    (reference: ``normalize(' '.join(concept_labels.get(c, [])))``,
    thesis/process_data_features.py:147-148)."""
    from ontology_mapping_spark.textnorm import normalize_col

    return labels.select(
        "uri", "side", normalize_col(F.array_join("labels", " ")).alias("text")
    )
