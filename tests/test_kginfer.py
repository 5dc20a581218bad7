"""Forward-chaining rule saturation (operators/kginfer).

Semantics pinned on hand-computed closures; the load-bearing property is
semi-naive completeness — a fact derivable only THROUGH another derived
fact must still be found — plus guaranteed termination on cycles and a
loud failure on max_iters overflow.
"""

from __future__ import annotations

import pytest

from ontology_mapping_spark.operators.kginfer import (
    entailed_triples,
    rdfs_rules,
    saturate,
)

T = "subject string, predicate string, object string"


def tset(df):
    return {(r["subject"], r["predicate"], r["object"]) for r in df.collect()}


@pytest.fixture(scope="module")
def kg(spark):
    rows = [
        ("b", "subClassOf", "a"),
        ("c", "subClassOf", "a"),
        ("d", "subClassOf", "b"),
        ("x1", "type", "d"),
        ("x2", "type", "c"),
    ]
    return spark.createDataFrame(rows, T).cache()


def test_rdfs_closure_exact(kg):
    ent = tset(entailed_triples(kg, rdfs_rules()))
    assert ent == {
        ("d", "subClassOf", "a"),
        ("x1", "type", "b"),
        ("x1", "type", "a"),
        ("x2", "type", "a"),
    }
    sat = tset(saturate(kg, rdfs_rules()))
    assert sat == tset(kg) | ent  # saturation = input ∪ entailed


def test_inference_chains_through_derived_facts(spark):
    # m hasPart n  --subPropertyOf-->  m related n  --domain-->  m type thing:
    # the type fact is derivable ONLY from a derived fact, so it proves the
    # fixpoint feeds derived triples back into rule bodies
    rows = [
        ("hasPart", "subPropertyOf", "related"),
        ("related", "domain", "thing"),
        ("m", "hasPart", "n"),
    ]
    kg = spark.createDataFrame(rows, T)
    sat = tset(
        saturate(kg, rdfs_rules(sub_property="subPropertyOf", domain="domain"))
    )
    assert ("m", "related", "n") in sat
    assert ("m", "type", "thing") in sat


def test_range_rule_types_the_object(spark):
    rows = [("eats", "range", "food"), ("m", "eats", "n")]
    kg = spark.createDataFrame(rows, T)
    assert ("n", "type", "food") in tset(saturate(kg, rdfs_rules(range_="range")))


def test_cycle_terminates(spark):
    kg = spark.createDataFrame(
        [("a", "subClassOf", "b"), ("b", "subClassOf", "a")], T
    )
    # finite Herbrand base: the closure is the 4 ordered pairs, then fixpoint
    assert tset(saturate(kg, rdfs_rules())) == {
        ("a", "subClassOf", "b"),
        ("b", "subClassOf", "a"),
        ("a", "subClassOf", "a"),
        ("b", "subClassOf", "b"),
    }


def test_max_iters_overflow_raises(spark):
    # depth-4 chain: round 1 derives the 2-hop pairs, round 2 the 3-hop
    # pair, round 3 confirms the empty delta — 3 rounds to converge
    rows = [("e", "subClassOf", "d"), ("d", "subClassOf", "b"), ("b", "subClassOf", "a")]
    kg = spark.createDataFrame(rows, T)
    with pytest.raises(RuntimeError, match="did not converge"):
        saturate(kg, rdfs_rules(), max_iters=2)
    assert ("e", "subClassOf", "a") in tset(saturate(kg, rdfs_rules(), max_iters=3))


def test_saturate_is_idempotent_and_set_semantic(kg):
    once = saturate(kg, rdfs_rules())
    twice = saturate(once, rdfs_rules())
    assert tset(once) == tset(twice)
    assert once.count() == twice.count() == len(tset(once))  # a set, no dups


def test_rule_validation(kg):
    with pytest.raises(ValueError, match="at least one rule"):
        saturate(kg, [])
    with pytest.raises(ValueError, match="body patterns and a head"):
        saturate(kg, [([], [("?a", "p", "?b")])])
    with pytest.raises(ValueError, match="not bound"):
        # head uses a variable the body never binds (not range-restricted)
        saturate(kg, [([("?a", "subClassOf", "?b")], [("?a", "p", "?zzz")])])


def test_incremental_equals_full_resaturation(spark, kg):
    from ontology_mapping_spark.operators.kginfer import saturate_incremental

    base = saturate(kg, rdfs_rules())
    # a new crawl asserts: new subtree under d, and a new instance of c
    delta = spark.createDataFrame(
        [("f", "subClassOf", "d"), ("x3", "type", "f"), ("x2", "type", "c")],
        T,  # x2-type-c is already known: must be ignored, not re-derived
    )
    inc = saturate_incremental(base, delta, rdfs_rules())
    full = saturate(kg.unionByName(delta), rdfs_rules())
    assert tset(inc) == tset(full)
    # the deep chain propagated: f's instance inherits every ancestor type
    assert {("x3", "type", c) for c in ("f", "d", "b", "a")} <= tset(inc)


def test_incremental_empty_or_known_delta_is_noop(spark, kg):
    from ontology_mapping_spark.operators.kginfer import saturate_incremental

    base = saturate(kg, rdfs_rules())
    known = spark.createDataFrame([("b", "subClassOf", "a")], T)
    assert tset(saturate_incremental(base, known, rdfs_rules())) == tset(base)


def test_incremental_assume_distinct_equivalent(spark, kg):
    from ontology_mapping_spark.operators.kginfer import saturate_incremental

    base = saturate(kg, rdfs_rules())
    delta = spark.createDataFrame([("f", "subClassOf", "d"), ("x3", "type", "f")], T)
    fast = saturate_incremental(base, delta, rdfs_rules(), assume_distinct=True)
    slow = saturate_incremental(base, delta, rdfs_rules())
    assert tset(fast) == tset(slow)


# --------------------------------------------------------------------------
# schema-driven OWL property characteristics (owl_rules)
# --------------------------------------------------------------------------

def test_owl_rules_schema_driven(spark):
    from ontology_mapping_spark.operators.kginfer import owl_rules

    rows = [
        # declarations are ordinary triples in the graph
        ("childOf", "inverseOf", "parentOf"),
        ("adj", "type", "SymmetricProperty"),
        ("anc", "type", "TransitiveProperty"),
        # instance facts
        ("d", "childOf", "b"),
        ("a", "parentOf", "c"),
        ("m", "adj", "n"),
        ("p1", "anc", "p2"),
        ("p2", "anc", "p3"),
        ("p3", "anc", "p4"),
    ]
    kg = spark.createDataFrame(rows, T)
    ent = tset(entailed_triples(kg, owl_rules()))
    assert ent == {
        ("b", "parentOf", "d"),   # inverse, declared direction
        ("c", "childOf", "a"),    # inverse, reverse direction
        ("n", "adj", "m"),        # symmetric
        ("p1", "anc", "p3"),      # transitive ...
        ("p2", "anc", "p4"),
        ("p1", "anc", "p4"),      # ... through a derived fact
    }


def test_owl_transitive_matches_dedicated_closure(spark):
    from pyspark.sql import functions as F

    from ontology_mapping_spark.operators import graph as G
    from ontology_mapping_spark.operators.kginfer import owl_rules

    edges = [(f"n{i}", "anc", f"n{i + 1}") for i in range(9)]
    kg = spark.createDataFrame(
        edges + [("anc", "type", "TransitiveProperty")], T
    )
    sat = saturate(kg, owl_rules(inverse_of=None, symmetric_class=None))
    got = {
        (r["subject"], r["object"])
        for r in sat.filter(
            (F.col("predicate") == "anc") & (F.col("subject") != "anc")
        ).collect()
    }
    clo = G.transitive_closure(
        spark.createDataFrame(
            [(s, o) for s, _p, o in edges], "child string, parent string"
        )
    )
    want = {(r["node"], r["ancestor"]) for r in clo.collect()}
    assert got == want


def test_owl_rules_all_disabled_raises():
    from ontology_mapping_spark.operators.kginfer import owl_rules

    with pytest.raises(ValueError, match="disabled"):
        owl_rules(inverse_of=None, symmetric_class=None, transitive_class=None)


# ---------------------------------------------------------------------------
# retract_incremental (DRed): the deletion twin of saturate_incremental.
# The load-bearing property is equivalence with full re-saturation of the
# post-retraction asserted base; the classic trap is the alternative
# derivation (an overdeleted fact that must be REDERIVED from survivors).


def _retract(spark, asserted_rows, removal_rows, rules, **kw):
    from ontology_mapping_spark.operators.kginfer import retract_incremental

    asserted = spark.createDataFrame(asserted_rows, T)
    sat = saturate(asserted, rules)
    removals = spark.createDataFrame(removal_rows, T)
    return retract_incremental(sat, asserted, removals, rules, **kw)


def _resat(spark, asserted_rows, removal_rows, rules):
    remaining = [r for r in asserted_rows if r not in set(removal_rows)]
    return saturate(spark.createDataFrame(remaining, T), rules)


def test_retract_equals_full_resaturation(spark):
    rows = [
        ("b", "subClassOf", "a"),
        ("c", "subClassOf", "b"),
        ("d", "subClassOf", "c"),
        ("e", "subClassOf", "d"),
        ("x1", "type", "e"),
        ("x2", "type", "c"),
    ]
    removals = [("c", "subClassOf", "b"), ("x2", "type", "c")]
    got = _retract(spark, rows, removals, rdfs_rules())
    want = _resat(spark, rows, removals, rdfs_rules())
    assert tset(got) == tset(want)


def test_retract_alternative_derivation_rederives(spark):
    # diamond: a->c via b AND via d; retracting a->b must NOT lose (a,c)
    rows = [
        ("a", "subClassOf", "b"),
        ("b", "subClassOf", "c"),
        ("a", "subClassOf", "d"),
        ("d", "subClassOf", "c"),
    ]
    removals = [("a", "subClassOf", "b")]
    got = tset(_retract(spark, rows, removals, rdfs_rules()))
    assert ("a", "subClassOf", "c") in got  # rederived through d
    assert ("a", "subClassOf", "b") not in got
    assert got == tset(_resat(spark, rows, removals, rdfs_rules()))


def test_retract_put_back_keeps_asserted_overdeletions(spark):
    # (a,c) is BOTH asserted and derivable via the retracted chain: the
    # overdelete taints it, the put-back restores it
    rows = [
        ("a", "subClassOf", "b"),
        ("b", "subClassOf", "c"),
        ("a", "subClassOf", "c"),
    ]
    removals = [("a", "subClassOf", "b")]
    got = tset(_retract(spark, rows, removals, rdfs_rules()))
    assert got == {("b", "subClassOf", "c"), ("a", "subClassOf", "c")}


def test_retract_derived_only_or_unknown_is_noop(spark):
    rows = [
        ("b", "subClassOf", "a"),
        ("c", "subClassOf", "b"),
    ]
    sat_before = tset(_resat(spark, rows, [], rdfs_rules()))
    # (c, subClassOf, a) is derived, never asserted; (z,*,z) is unknown
    for removals in (
        [("c", "subClassOf", "a")],
        [("z", "subClassOf", "z")],
    ):
        got = tset(_retract(spark, rows, removals, rdfs_rules()))
        assert got == sat_before


def test_retract_cascade_drops_the_whole_chain_suffix(spark):
    rows = [(f"n{i}", "subClassOf", f"n{i + 1}") for i in range(6)] + [
        ("x", "type", "n0")
    ]
    removals = [("n2", "subClassOf", "n3")]
    got = _retract(spark, rows, removals, rdfs_rules())
    want = _resat(spark, rows, removals, rdfs_rules())
    assert tset(got) == tset(want)
    # spot pins: nothing crosses the cut edge any more
    assert ("n0", "subClassOf", "n4") not in tset(got)
    assert ("x", "type", "n2") in tset(got)
    assert ("x", "type", "n3") not in tset(got)


def test_retract_under_variable_predicate_rules(spark):
    # sub-property rules carry a variable predicate scan — exercises the
    # constraint-propagation toggle path through overdelete + rederive
    rules = rdfs_rules(sub_property="subPropertyOf", domain="domain")
    rows = [
        ("hasPart", "subPropertyOf", "related"),
        ("related", "domain", "thing"),
        ("m", "hasPart", "n"),
        ("m2", "related", "n2"),
    ]
    removals = [("hasPart", "subPropertyOf", "related")]
    got = _retract(spark, rows, removals, rules)
    want = _resat(spark, rows, removals, rules)
    assert tset(got) == tset(want)
    assert ("m", "related", "n") not in tset(got)
    assert ("m2", "type", "thing") in tset(got)


def test_retract_assume_distinct_equivalent(spark):
    from ontology_mapping_spark.operators.kginfer import retract_incremental

    rows = [
        ("b", "subClassOf", "a"),
        ("c", "subClassOf", "b"),
        ("d", "subClassOf", "c"),
    ]
    asserted = spark.createDataFrame(rows, T)
    sat = saturate(asserted, rdfs_rules())
    removals = spark.createDataFrame([("c", "subClassOf", "b")], T)
    slow = retract_incremental(sat, asserted, removals, rdfs_rules())
    fast = retract_incremental(
        sat, asserted, removals, rdfs_rules(), assume_distinct=True
    )
    assert tset(slow) == tset(fast)


def test_retract_overdelete_overflow_raises(spark):
    from ontology_mapping_spark.operators.kginfer import retract_incremental

    rows = [(f"n{i}", "subClassOf", f"n{i + 1}") for i in range(8)]
    asserted = spark.createDataFrame(rows, T)
    sat = saturate(asserted, rdfs_rules())
    removals = spark.createDataFrame([("n0", "subClassOf", "n1")], T)
    with pytest.raises(RuntimeError, match="max_iters"):
        retract_incremental(
            sat, asserted, removals, rdfs_rules(), max_iters=1
        )


def test_retract_rederives_with_iri_ref_rule_constants(spark):
    """Rules written with '<...>'-wrapped IRI constants store BARE iris
    (template instantiation strips the brackets), so the rederive
    stage's suspect filter must strip them too — a verbatim '<iri>'
    comparison matches zero suspects and silently loses alternative
    derivations (the diamond case) for bracketed rule sets."""
    sub = "<http://www.w3.org/2000/01/rdf-schema#subClassOf>"
    bare = sub[1:-1]
    rules = [
        (
            [("?a", sub, "?b"), ("?b", sub, "?c")],
            [("?a", sub, "?c")],
        )
    ]
    # diamond: a->c via b AND via d; retracting a->b must rederive (a,c)
    rows = [
        ("a", bare, "b"),
        ("b", bare, "c"),
        ("a", bare, "d"),
        ("d", bare, "c"),
    ]
    removals = [("a", bare, "b")]
    got = tset(_retract(spark, rows, removals, rules))
    assert ("a", bare, "c") in got  # rederived through d
    assert ("a", bare, "b") not in got
    assert got == tset(_resat(spark, rows, removals, rules))
