"""SHACL-lite shape validation: semantics pinned on a hand-built KG."""

from __future__ import annotations

import pytest

from ontology_mapping_spark.operators.kgvalidate import (
    ShapeRule,
    validate_kg,
    validation_report,
)


@pytest.fixture(scope="module")
def kg(spark):
    rows = [
        ("a", "label", "root"),
        ("b", "label", "left"),
        ("b", "label", "left-alias"),   # b has TWO labels
        ("b", "broader", "a"),
        ("c", "broader", "a"),          # c has NO label
        ("c", "broader", "zzz"),        # zzz is not a subject of label
        ("d", "label", ""),             # empty literal
        ("d", "broader", "b"),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )


def test_min_count_flags_missing(kg):
    got = validate_kg(kg, [ShapeRule("every-node-labelled", "label", min_count=1)])
    assert [(r["rule"], r["node"]) for r in got.collect()] == [
        ("every-node-labelled", "c")
    ]


def test_max_count_flags_excess(kg):
    got = validate_kg(kg, [ShapeRule("one-label", "label", max_count=1)]).collect()
    assert [(r["node"], r["detail"]) for r in got] == [
        ("b", "count label = 2 > max 1")
    ]


def test_range_membership(kg):
    got = validate_kg(
        kg,
        [ShapeRule("broader-target-labelled", "broader",
                   object_in_subjects_of="label")],
    ).collect()
    assert [r["node"] for r in got] == ["zzz"]


def test_object_pattern(kg):
    got = validate_kg(
        kg, [ShapeRule("nonempty-label", "label", object_pattern=r"^.+$")]
    ).collect()
    assert [r["node"] for r in got] == [""]


def test_report_zero_fills_clean_rules(kg):
    rules = [
        ShapeRule("every-node-labelled", "label", min_count=1),
        ShapeRule("one-label", "label", max_count=1),
        ShapeRule("broader-target-labelled", "broader",
                  object_in_subjects_of="label"),
        ShapeRule("broader-max", "broader", max_count=5),  # clean
    ]
    got = {r["rule"]: r["violations"]
           for r in validation_report(kg, rules).collect()}
    assert got == {
        "every-node-labelled": 1,
        "one-label": 1,
        "broader-target-labelled": 1,
        "broader-max": 0,
    }


def test_constraintless_rule_raises():
    with pytest.raises(ValueError, match="no constraint"):
        ShapeRule("empty", "label")


def test_empty_rules_raises(kg):
    with pytest.raises(ValueError, match="at least one rule"):
        validate_kg(kg, [])
