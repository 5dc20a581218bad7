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


def test_object_in_enumeration(spark):
    kg = spark.createDataFrame(
        [
            ("a", "status", "active"),
            ("b", "status", "retired"),
            ("c", "status", "zombie"),
        ],
        "subject string, predicate string, object string",
    )
    got = validate_kg(
        kg, [ShapeRule("status-enum", "status",
                       object_in=("active", "retired"))]
    ).collect()
    assert [(r["rule"], r["node"]) for r in got] == [("status-enum", "zombie")]
    with pytest.raises(ValueError, match="at least one value"):
        ShapeRule("empty-enum", "status", object_in=())


def test_object_class_typing(spark):
    kg = spark.createDataFrame(
        [
            ("x", "worksFor", "acme"),
            ("x", "worksFor", "ghost"),
            ("acme", "type", "Org"),
            ("ghost", "type", "Person"),   # wrong class
        ],
        "subject string, predicate string, object string",
    )
    got = validate_kg(
        kg, [ShapeRule("employer-is-org", "worksFor", object_class="Org")]
    ).collect()
    assert [(r["rule"], r["node"]) for r in got] == [
        ("employer-is-org", "ghost")
    ]
    # custom type predicate
    kg2 = spark.createDataFrame(
        [("x", "worksFor", "acme"), ("acme", "a", "Org")],
        "subject string, predicate string, object string",
    )
    assert validate_kg(
        kg2,
        [ShapeRule("employer-is-org", "worksFor", object_class="Org",
                   type_predicate="a")],
    ).count() == 0
