"""SHACL-lite shape validation over the emitted KG.

The pipeline emits (subject, predicate, object) triples (plans/pipeline.py
``kg_triples``); at 10^12 scale nobody eyeballs the output, so the engine
needs a declarative, distributed constraint checker — the quality gate a
KG-construction run publishes next to its lineage manifests. This module
implements the useful core of SHACL (shapes constraint language) as pure
Catalyst plans:

* ``min_count`` / ``max_count`` — per-focus-node cardinality of a
  predicate (focus nodes = every distinct subject of the KG, SHACL's
  implicit node-shape target). One map-side-combinable count aggregate.
* ``object_in_subjects_of`` — a range constraint: every object of the
  predicate must itself appear as a subject of some other predicate
  (e.g. every ``broader`` target must carry a ``label``). One anti-join;
  the reference side is deduplicated subjects, broadcast-able when the
  vocabulary is dimension-sized.
* ``object_pattern`` — literal shape: objects must match a regex
  (``rlike``, whole-stage codegen).

``validate_kg`` returns one row per violation (rule, node, detail) —
joinable back to lineage; ``validation_report`` reduces it to per-rule
counts, the row a run would publish with its metrics. Both are plain
DataFrames: a failed run gates itself by checking ``report.violations``.

No SHACL implementation existed in the reference (its output checks are
the pytest assertions in thesis tests); this is engine-side
infrastructure the 100 TB target needs.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ShapeRule:
    """One declarative constraint over the triple table.

    ``predicate`` scopes the rule; set any of the constraint fields:

    * ``min_count`` — every focus node (distinct KG subject) must have at
      least this many triples with the predicate (``min_count=1`` ==
      SHACL ``sh:minCount 1`` under the implicit all-subjects target);
    * ``max_count`` — no subject may exceed this many;
    * ``object_in_subjects_of`` — every object must appear as a subject
      of the named predicate (range/closed-world membership);
    * ``object_pattern`` — every object must match this regex;
    * ``object_in`` — every object must be one of these literal values
      (SHACL ``sh:in``; a codegen ``isin``, no join);
    * ``object_class`` — every object must be typed as this class, i.e.
      carry an ``(object, type_predicate, object_class)`` triple (SHACL
      ``sh:class`` without subclass widening — saturate the KG with
      ``kginfer.rdfs_rules`` first to validate against the inferred
      types, which is exactly SHACL-on-entailed-graph).
    """

    name: str
    predicate: str
    min_count: int | None = None
    max_count: int | None = None
    object_in_subjects_of: str | None = None
    object_pattern: str | None = None
    object_in: tuple[str, ...] | None = None
    object_class: str | None = None
    type_predicate: str = "type"

    def __post_init__(self) -> None:
        if (
            self.min_count is None
            and self.max_count is None
            and self.object_in_subjects_of is None
            and self.object_pattern is None
            and self.object_in is None
            and self.object_class is None
        ):
            raise ValueError(f"rule {self.name!r} declares no constraint")
        if self.object_in is not None and not self.object_in:
            raise ValueError(
                f"rule {self.name!r}: object_in needs at least one value"
            )


def validate_kg(triples: DataFrame, rules: Sequence[ShapeRule]) -> DataFrame:
    """(rule, node, detail) — one row per constraint violation.

    ``node`` is the focus subject for cardinality rules and the offending
    object for range/pattern rules; ``detail`` says what was observed.
    The result is the union of per-rule plans — each an independent
    scan-filter-aggregate, so Spark schedules them in parallel and a rule
    over a rare predicate prunes to that predicate's partition when the
    triple table is predicate-partitioned (the kgquery layout).
    """
    if not rules:
        raise ValueError("validate_kg needs at least one rule")
    focus = triples.select("subject").distinct()
    parts: list[DataFrame] = []
    for r in rules:
        scoped = triples.filter(F.col("predicate") == r.predicate)
        if r.min_count is not None or r.max_count is not None:
            counts = scoped.groupBy("subject").agg(
                F.count(F.lit(1)).cast("long").alias("__n")
            )
            # left join from ALL focus nodes so absent predicates count 0
            per_node = focus.join(counts, "subject", "left").select(
                "subject", F.coalesce(F.col("__n"), F.lit(0)).alias("__n")
            )
            if r.min_count is not None:
                parts.append(
                    per_node.filter(F.col("__n") < r.min_count).select(
                        F.lit(r.name).alias("rule"),
                        F.col("subject").alias("node"),
                        F.concat(
                            F.lit(f"count {r.predicate} = "),
                            F.col("__n").cast("string"),
                            F.lit(f" < min {r.min_count}"),
                        ).alias("detail"),
                    )
                )
            if r.max_count is not None:
                parts.append(
                    per_node.filter(F.col("__n") > r.max_count).select(
                        F.lit(r.name).alias("rule"),
                        F.col("subject").alias("node"),
                        F.concat(
                            F.lit(f"count {r.predicate} = "),
                            F.col("__n").cast("string"),
                            F.lit(f" > max {r.max_count}"),
                        ).alias("detail"),
                    )
                )
        if r.object_in_subjects_of is not None:
            members = (
                triples.filter(
                    F.col("predicate") == r.object_in_subjects_of
                )
                .select(F.col("subject").alias("object"))
                .distinct()
            )
            parts.append(
                scoped.select("object")
                .distinct()
                .join(members, "object", "left_anti")
                .select(
                    F.lit(r.name).alias("rule"),
                    F.col("object").alias("node"),
                    F.lit(
                        f"object of {r.predicate} is not a subject of "
                        f"{r.object_in_subjects_of}"
                    ).alias("detail"),
                )
            )
        if r.object_pattern is not None:
            parts.append(
                scoped.filter(~F.col("object").rlike(r.object_pattern))
                .select("object")
                .distinct()
                .select(
                    F.lit(r.name).alias("rule"),
                    F.col("object").alias("node"),
                    F.lit(
                        f"object of {r.predicate} !~ /{r.object_pattern}/"
                    ).alias("detail"),
                )
            )
        if r.object_in is not None:
            parts.append(
                scoped.filter(~F.col("object").isin(list(r.object_in)))
                .select("object")
                .distinct()
                .select(
                    F.lit(r.name).alias("rule"),
                    F.col("object").alias("node"),
                    F.lit(
                        f"object of {r.predicate} not in "
                        f"{sorted(r.object_in)}"
                    ).alias("detail"),
                )
            )
        if r.object_class is not None:
            typed = (
                triples.filter(
                    (F.col("predicate") == r.type_predicate)
                    & (F.col("object") == r.object_class)
                )
                .select(F.col("subject").alias("object"))
                .distinct()
            )
            parts.append(
                scoped.select("object")
                .distinct()
                .join(typed, "object", "left_anti")
                .select(
                    F.lit(r.name).alias("rule"),
                    F.col("object").alias("node"),
                    F.lit(
                        f"object of {r.predicate} lacks ({r.type_predicate} "
                        f"{r.object_class})"
                    ).alias("detail"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validation_report(
    triples: DataFrame, rules: Sequence[ShapeRule]
) -> DataFrame:
    """(rule, violations) per declared rule, zero-filled — the per-run
    quality row a pipeline publishes with its metrics sink."""
    spark = triples.sparkSession
    names = spark.createDataFrame(
        [(r.name,) for r in rules], "rule string"
    )
    counts = (
        validate_kg(triples, rules)
        .groupBy("rule")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return names.join(counts, "rule", "left").select(
        "rule",
        F.coalesce(F.col("violations"), F.lit(0))
        .cast("long")
        .alias("violations"),
    )
