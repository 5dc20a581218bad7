"""BGP (conjunctive triple-pattern) matching over the emitted KG.

Semantics pinned against hand-computed solution sets on a small graph, plus
the plan-shape guarantees that matter at scale (no cartesian product for a
connected BGP; broadcast hint on >=2-constant patterns).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontology_mapping_spark.operators.kgquery import (
    bgp_construct,
    bgp_match,
    bgp_match_paths,
    bgp_union,
    with_path_closures,
)


@pytest.fixture(scope="module")
def kg(spark):
    rows = [
        # a small class tree: b,c broader a; d broader b
        ("b", "broader", "a"),
        ("c", "broader", "a"),
        ("d", "broader", "b"),
        # labels
        ("a", "label", "root"),
        ("b", "label", "left"),
        ("c", "label", "right"),
        ("d", "label", "leaf"),
        # a self-loop for the repeated-variable case
        ("e", "broader", "e"),
        # a duplicate triple for bag semantics
        ("c", "broader", "a"),
    ]
    return spark.createDataFrame(rows, "subject string, predicate string, object string").cache()


def test_single_pattern_binds_variables(kg):
    got = bgp_match(kg, [("?x", "broader", "a")])
    assert sorted(r["x"] for r in got.collect()) == ["b", "c", "c"]


def test_two_hop_join_with_label(kg):
    pats = [("?x", "broader", "?y"), ("?y", "broader", "?z"), ("?x", "label", "?xl")]
    got = bgp_match(kg, pats, select=["?x", "?z", "?xl"]).collect()
    assert sorted((r["x"], r["z"], r["xl"]) for r in got) == [("d", "a", "leaf")]


def test_bag_semantics_duplicates_multiply(kg):
    # (c, broader, a) appears twice -> two solutions for x=c
    got = bgp_match(kg, [("?x", "broader", "a"), ("?x", "label", "?l")]).collect()
    assert sorted((r["x"], r["l"]) for r in got) == [
        ("b", "left"),
        ("c", "right"),
        ("c", "right"),
    ]


def test_repeated_variable_within_pattern(kg):
    got = bgp_match(kg, [("?x", "broader", "?x")]).collect()
    assert [r["x"] for r in got] == ["e"]


def test_ground_pattern_is_existence_check(kg):
    # ground (d, broader, b) holds once -> solutions unchanged
    got = bgp_match(
        kg, [("?x", "label", "?l"), ("d", "broader", "b")], select=["?x"]
    )
    assert got.count() == 4
    # ground (d, broader, a) does not hold -> empty
    got2 = bgp_match(kg, [("?x", "label", "?l"), ("d", "broader", "a")])
    assert got2.count() == 0


def test_all_ground_bgp_returns_matched_rows(kg):
    got = bgp_match(kg, [("c", "broader", "a")]).collect()
    assert [r["matched"] for r in got] == [True, True]  # duplicate triple


def test_disconnected_raises_unless_allowed(kg):
    pats = [("?x", "broader", "a"), ("?y", "label", "leaf")]
    with pytest.raises(ValueError, match="disconnected"):
        bgp_match(kg, pats)
    got = bgp_match(kg, pats, allow_product=True).collect()
    assert sorted((r["x"], r["y"]) for r in got) == [("b", "d"), ("c", "d"), ("c", "d")]


def test_select_unbound_raises(kg):
    with pytest.raises(ValueError, match="unbound"):
        bgp_match(kg, [("?x", "broader", "a")], select=["?nope"])


def test_connected_plan_has_no_cartesian(kg):
    pats = [("?x", "broader", "?y"), ("?y", "label", "?yl")]
    plan = bgp_match(kg, pats)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_two_constant_pattern_broadcasts(kg, spark):
    # disable auto-broadcast so any BroadcastHashJoin must come from the hint
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pats = [("?x", "broader", "?y"), ("?x", "label", "leaf")]
        plan = bgp_match(kg, pats)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_matches_sql_self_join(kg, spark):
    # the BGP compiler must agree with the hand-written SQL self-join
    kg.createOrReplaceTempView("kg_t")
    want = spark.sql(
        """SELECT a.subject AS x, b.object AS z
           FROM kg_t a JOIN kg_t b ON a.object = b.subject
           WHERE a.predicate = 'broader' AND b.predicate = 'broader'"""
    )
    got = bgp_match(kg, [("?x", "broader", "?y"), ("?y", "broader", "?z")],
                    select=["?x", "?z"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# --------------------------------------------------------------------------
# SPARQL 1.1 property paths ('pred+', 'pred*') via the distributed closure
# --------------------------------------------------------------------------

def test_plus_path_distinct_pairs(kg):
    # d->b->a, b->a, c->a; the duplicate (c, broader, a) triple collapses —
    # a path predicate yields DISTINCT node pairs (SPARQL spec), unlike the
    # bag semantics of a plain pattern
    got = bgp_match_paths(kg, [("?x", "broader+", "a")], max_iters=4).collect()
    assert sorted(r["x"] for r in got) == ["b", "c", "d"]


def test_star_path_includes_zero_length(kg):
    # broader* adds the identity pair for every node of the KG, so 'a'
    # itself now matches
    got = bgp_match_paths(kg, [("?x", "broader*", "a")], max_iters=4).collect()
    assert sorted(r["x"] for r in got) == ["a", "b", "c", "d"]


def test_path_joins_with_plain_pattern(kg):
    pats = [("?x", "broader+", "a"), ("?x", "label", "?l")]
    got = bgp_match_paths(kg, pats, max_iters=4).collect()
    assert sorted((r["x"], r["l"]) for r in got) == [
        ("b", "left"),
        ("c", "right"),
        ("d", "leaf"),
    ]


def test_cycle_is_bounded_by_max_iters(kg):
    # e broader e is a cycle: the closure cannot converge, max_iters caps
    # the doubling; the pair set is still just {(e, e)}
    got = bgp_match_paths(kg, [("?x", "broader+", "e")], max_iters=3).collect()
    assert sorted(r["x"] for r in got) == ["e"]


def test_plain_patterns_keep_bag_semantics_alongside_paths(kg):
    # the augmented triple table must not disturb non-path patterns:
    # (?x broader a) still sees the duplicate triple twice
    got = bgp_match_paths(
        kg, [("?x", "broader", "a")], max_iters=4
    ).collect()
    assert sorted(r["x"] for r in got) == ["b", "c", "c"]


def test_with_path_closures_matches_sql_recursion(kg, spark):
    # the closure-augmented table must agree with a hand-rolled iterative
    # SQL expansion of broader+ on the acyclic component
    aug = with_path_closures(
        kg.filter(F.col("subject") != "e"), [("?x", "broader+", "?y")], max_iters=4
    )
    got = (
        aug.filter(F.col("predicate") == "broader+")
        .select("subject", "object")
        .collect()
    )
    assert sorted(map(tuple, got)) == [
        ("b", "a"),
        ("c", "a"),
        ("d", "a"),
        ("d", "b"),
    ]


# --------------------------------------------------------------------------
# OPTIONAL / UNION / FILTER (the SPARQL algebra beyond the conjunctive BGP)
# --------------------------------------------------------------------------

def test_optional_null_pads_unmatched(kg):
    # e has no label: OPTIONAL keeps its solution with l = NULL
    got = bgp_match(
        kg, [("?x", "broader", "?y")], optional=[[("?x", "label", "?l")]]
    ).collect()
    assert sorted(((r["x"], r["y"], r["l"]) for r in got), key=str) == sorted(
        [
            ("b", "a", "left"),
            ("c", "a", "right"),
            ("c", "a", "right"),
            ("d", "b", "leaf"),
            ("e", "e", None),
        ],
        key=str,
    )


def test_optional_requires_shared_variable(kg):
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match(
            kg, [("?x", "broader", "a")], optional=[[("?z", "label", "?l")]]
        )
    with pytest.raises(ValueError, match="binds no variables"):
        bgp_match(kg, [("?x", "broader", "a")], optional=[[("d", "broader", "b")]])


def test_filter_expr_prunes_solutions(kg):
    got = bgp_match(
        kg, [("?x", "broader", "?y")], filter_expr="x <> y"
    ).collect()
    assert sorted(r["x"] for r in got) == ["b", "c", "c", "d"]


def test_filter_on_unbound_optional_drops_null_rows(kg):
    # SPARQL: FILTER over an unbound variable errors -> solution dropped;
    # Spark: NULL comparison is not-true -> filtered. Same outcome.
    got = bgp_match(
        kg,
        [("?x", "broader", "?y")],
        optional=[[("?x", "label", "?l")]],
        filter_expr="l = 'leaf'",
    ).collect()
    assert [(r["x"], r["l"]) for r in got] == [("d", "leaf")]


def test_union_null_pads_disjoint_variables(kg):
    got = bgp_union(
        kg, [[("?x", "label", "?l")], [("?x", "broader", "a")]]
    ).collect()
    rows = sorted(((r["x"], r["l"]) for r in got), key=str)
    assert rows == sorted(
        [
            ("a", "root"),
            ("b", "left"),
            ("c", "right"),
            ("d", "leaf"),
            ("b", None),
            ("c", None),
            ("c", None),  # duplicate triple: UNION is a bag union
        ],
        key=str,
    )


def test_union_plan_has_no_extra_shuffle(kg):
    plan = (
        bgp_union(kg, [[("?x", "label", "?l")], [("?x", "broader", "a")]])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # union of two filtered scans is shuffle-free


def test_paths_inside_optional(kg):
    # required: every labelled node; optional: its broader+ ancestors
    got = bgp_match_paths(
        kg,
        [("?x", "label", "?l")],
        optional=[[("?x", "broader+", "?anc")]],
        max_iters=4,
    ).collect()
    assert sorted(((r["x"], r["anc"]) for r in got), key=str) == sorted(
        [("a", None), ("b", "a"), ("c", "a"), ("d", "a"), ("d", "b")], key=str
    )


# --------------------------------------------------------------------------
# CONSTRUCT (rule-based materialization of new triples from BGP solutions)
# --------------------------------------------------------------------------

def test_construct_grandparent_rule(kg):
    got = bgp_construct(
        kg,
        [("?x", "broader", "?y"), ("?y", "broader", "?z")],
        [("?x", "grandparent", "?z")],
    ).collect()
    # d->b->a plus the e self-loop (e,broader,e twice-joined -> e,e)
    assert sorted(map(tuple, got)) == [
        ("d", "grandparent", "a"),
        ("e", "grandparent", "e"),
    ]


def test_construct_multiple_templates_and_constants(kg):
    got = bgp_construct(
        kg,
        [("?x", "broader", "a")],
        [("?x", "child_of", "a"), ("a", "parent_of", "?x")],
    ).collect()
    assert sorted(map(tuple, got)) == [
        ("a", "parent_of", "b"),
        ("a", "parent_of", "c"),
        ("b", "child_of", "a"),
        ("c", "child_of", "a"),
    ]


def test_construct_distinct_is_graph_semantics(kg):
    # duplicate triple (c, broader, a) produces duplicate solutions; the
    # constructed GRAPH dedups them unless distinct=False
    bag = bgp_construct(
        kg, [("?x", "broader", "a")], [("?x", "seen", "yes")], distinct=False
    )
    assert bag.count() == 3
    graph = bgp_construct(kg, [("?x", "broader", "a")], [("?x", "seen", "yes")])
    assert graph.count() == 2


def test_construct_drops_unbound_optional_terms(kg):
    # e has no label: its (e, lbl, ?l) template triple must not be emitted,
    # but its (e, kind, node) one is
    got = bgp_construct(
        kg,
        [("?x", "broader", "?y")],
        [("?x", "lbl", "?l"), ("?x", "kind", "node")],
        optional=[[("?x", "label", "?l")]],
    ).collect()
    rows = sorted(map(tuple, got))
    assert ("e", "kind", "node") in rows
    assert not any(r[0] == "e" and r[1] == "lbl" for r in rows)
    assert ("b", "lbl", "left") in rows


def test_construct_unbound_template_var_raises(kg):
    with pytest.raises(ValueError, match="not bound"):
        bgp_construct(kg, [("?x", "broader", "a")], [("?x", "p", "?nope")])


def test_construct_output_is_queryable(kg):
    derived = bgp_construct(
        kg,
        [("?x", "broader", "?y"), ("?y", "broader", "?z")],
        [("?x", "grandparent", "?z")],
    )
    back = bgp_match(derived, [("?g", "grandparent", "a")]).collect()
    assert [r["g"] for r in back] == ["d"]


def test_constant_predicate_pushes_to_parquet_scan(kg, spark, tmp_path):
    # the 10^12-scale claim: a constant term becomes a data-source filter,
    # not a post-scan one — pinned on a real parquet scan
    path = str(tmp_path / "triples_parquet")
    kg.write.mode("overwrite").parquet(path)
    scanned = spark.read.parquet(path)
    plan = (
        bgp_match(scanned, [("?x", "broader", "a")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan, plan
    assert "EqualTo(predicate,broader)" in plan, plan
    assert "EqualTo(object,a)" in plan, plan


def test_star_self_loop_is_one_solution(kg):
    """A node reaching itself via BOTH the one-or-more closure and the
    zero-length identity row is still ONE solution (DISTINCT pairs)."""
    got = [
        (r["x"], r["z"])
        for r in bgp_match_paths(kg, [("?x", "broader*", "?z")]).collect()
    ]
    assert got.count(("e", "e")) == 1


def test_variable_predicate_ignores_synthetic_path_triples(kg):
    """Synthetic 'pred+'/'pred*' closure rows are the path relation, not
    dataset triples: a ?p pattern in the same BGP must never bind them."""
    got = bgp_match_paths(
        kg, [("?x", "broader+", "?y"), ("?y", "?p", "?o")]
    ).collect()
    assert got, "join should still produce real solutions"
    assert all(not r["p"].endswith(("+", "*")) for r in got)
    # cross-check: identical to matching the closure first, then scanning
    # the ORIGINAL table for the second pattern
    clo = with_path_closures(kg, [("?x", "broader+", "?y")]).filter(
        F.col("predicate") == "broader+"
    )
    want = sorted(
        (h["subject"], h["object"], t["predicate"], t["object"])
        for h in clo.collect()
        for t in kg.collect()
        if t["subject"] == h["object"]
    )
    assert sorted((r["x"], r["y"], r["p"], r["o"]) for r in got) == want


# --------------------------------------------------------------------------
# negation (FILTER NOT EXISTS / MINUS), VALUES, and composite paths
# --------------------------------------------------------------------------

def test_not_exists_drops_matching_solutions(kg):
    # concepts with a parent whose parent is a root (no grandparent)
    got = bgp_match(
        kg,
        [("?x", "broader", "?y")],
        not_exists=[[("?y", "broader", "?z")]],
    ).collect()
    # b->a, c->a (x2 dup): kept (a is a root); d->b and e->e: dropped
    assert sorted(r["x"] for r in got) == ["b", "c", "c"]


def test_not_exists_without_shared_variable_raises(kg):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="NOT EXISTS"):
        bgp_match(
            kg,
            [("?x", "label", "?l")],
            not_exists=[[("?a", "broader", "?b")]],
        )


def test_exists_keeps_only_matching_solutions(kg):
    # labelled concepts that have a parent: the EXISTS semi-join keeps
    # b, c, d and drops the root a. The duplicate (c, broader, a) triple
    # must NOT multiply c's solution row (semi join, distinct-projected).
    got = bgp_match(
        kg,
        [("?x", "label", "?l")],
        exists=[[("?x", "broader", "?p")]],
    ).collect()
    assert sorted(r["x"] for r in got) == ["b", "c", "d"]


def test_exists_without_shared_variable_raises(kg):
    with pytest.raises(ValueError, match="EXISTS"):
        bgp_match(
            kg,
            [("?x", "label", "?l")],
            exists=[[("?a", "broader", "?b")]],
        )


def test_exists_unbound_shared_var_is_free(kg):
    # SPARQL substitution semantics: only BOUND variables substitute
    # into the EXISTS body. 'a' (the root) gets p=NULL from the
    # OPTIONAL; its EXISTS test leaves ?p free, and since SOME broader
    # edge has a parent (d->b->a), the row must be KEPT — a plain
    # equi-semi-join (NULL matches nothing) would drop it.
    got = bgp_match(
        kg,
        [("?x", "label", "?l")],
        optional=[[("?x", "broader", "?p")]],
        exists=[[("?p", "broader", "?q")]],
    ).collect()
    # bound rows: b->a, c->a (x2 dup), d->b. ?p broader ?q matches only
    # p=b (b->a) and p=e — so d (p=b) survives, b and c (p=a, bound, no
    # grandparent) drop, and a (p unbound, free) survives.
    assert sorted((r["x"], r["p"]) for r in got) == [("a", None), ("d", "b")]


def test_not_exists_unbound_shared_var_is_free(kg):
    # the mirror: NOT EXISTS must DROP the p-unbound row when the freed
    # body matches anything (the equi-anti-join would keep it)
    got = bgp_match(
        kg,
        [("?x", "label", "?l")],
        optional=[[("?x", "broader", "?p")]],
        not_exists=[[("?p", "broader", "?q")]],
    ).collect()
    assert sorted((r["x"], r["p"]) for r in got) == [
        ("b", "a"),
        ("c", "a"),
        ("c", "a"),
    ]


def test_exists_fast_path_stays_equi_join(kg):
    # when no shared variable is nullable the EXISTS test must remain a
    # plain equi semi-join — the wildcard BroadcastNestedLoopJoin is
    # reserved for genuinely nullable shared variables
    fast = bgp_match(
        kg,
        [("?x", "label", "?l")],
        exists=[[("?x", "broader", "?p")]],
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    slow = bgp_match(
        kg,
        [("?x", "label", "?l")],
        optional=[[("?x", "broader", "?p")]],
        exists=[[("?p", "broader", "?q")]],
    )
    plan2 = slow._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan2


def test_minus_mixed_null_shared_vars(spark):
    # MINUS removes a solution iff a compatible MINUS-solution exists
    # AND they share >=1 actually-bound variable. Row (x=b, p=NULL):
    # compatible with the minus row (x=b, p=anything) through the bound
    # x, so it is removed; row (x=c, p=NULL) shares x=c which the minus
    # group does not produce, so it stays.
    rows = [
        ("b", "label", "left"),
        ("c", "label", "right"),
        ("b", "rel", "z"),
    ]
    t = spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )
    got = bgp_match(
        t,
        [("?x", "label", "?l")],
        optional=[[("?x", "narrower", "?p")]],
        minus=[[("?x", "rel", "?p")]],
    ).collect()
    assert sorted(r["x"] for r in got) == ["c"]
    # and when the ONLY shared variable is the unbound one, the domains
    # never intersect, so MINUS removes nothing (spec; an EXISTS with
    # the same body would instead treat ?p as free and keep-on-any)
    got2 = bgp_match(
        t,
        [("?x", "label", "?l")],
        optional=[[("?x", "narrower", "?p")]],
        minus=[[("?p", "rel", "?w")]],
    ).collect()
    assert sorted(r["x"] for r in got2) == ["b", "c"]


def test_minus_disjoint_domain_removes_nothing(kg):
    got = bgp_match(
        kg,
        [("?x", "label", "?l")],
        minus=[[("?a", "broader", "?b")]],  # no shared variable -> no-op
    ).collect()
    assert len(got) == 4


def test_minus_shared_variable_removes_compatible(kg):
    # labelled concepts MINUS those that have a parent -> only 'a'
    got = bgp_match(
        kg,
        [("?x", "label", "?l")],
        minus=[[("?x", "broader", "?p")]],
    ).collect()
    assert sorted(r["x"] for r in got) == ["a"]


def test_values_restricts_and_extends(kg):
    got = bgp_match(
        kg,
        [("?x", "label", "?l")],
        values=[{"x": "b", "tag": "L"}, {"x": "d", "tag": "F"}],
    ).collect()
    assert sorted((r["x"], r["l"], r["tag"]) for r in got) == [
        ("b", "left", "L"),
        ("d", "leaf", "F"),
    ]


def test_inverse_path_is_swapped_scan(kg):
    got = bgp_match_paths(kg, [("a", "^broader", "?x")]).collect()
    want = bgp_match(kg, [("?x", "broader", "a")]).collect()
    assert sorted(r["x"] for r in got) == sorted(r["x"] for r in want)


def test_inverse_closure_composes(kg):
    # descendants of a = inverse of broader+ from a
    got = sorted(
        r["x"] for r in bgp_match_paths(kg, [("a", "^broader+", "?x")]).collect()
    )
    assert got == ["b", "c", "d"]


def test_sequence_path_chains_through_fresh_vars(kg):
    out = bgp_match_paths(kg, [("?x", "broader/label", "?l")])
    assert sorted(out.columns) == ["l", "x"]  # no ?__pathN leakage
    got = sorted((r["x"], r["l"]) for r in out.collect())
    # b->a->root, c->a->root (x2: duplicate (c,broader,a)), d->b->left;
    # e->e has no label
    assert got == [
        ("b", "root"), ("c", "root"), ("c", "root"), ("d", "left"),
    ]


def test_sequence_with_closure_element(kg):
    got = sorted(
        (r["x"], r["l"])
        for r in bgp_match_paths(
            kg, [("?x", "broader+/label", "?l")]
        ).collect()
    )
    # d's proper ancestors are b and a -> labels left and root
    assert ("d", "left") in got and ("d", "root") in got


def test_ground_sequence_is_existence_check(kg):
    out = bgp_match_paths(kg, [("d", "broader/broader", "a")])
    assert out.columns == ["matched"]
    assert out.count() == 1


def test_alternation_is_bag_union_of_branches(kg):
    got = bgp_match_paths(kg, [("?x", "broader|label", "?o")])
    n_broader = bgp_match(kg, [("?x", "broader", "?o")]).count()
    n_label = bgp_match(kg, [("?x", "label", "?o")]).count()
    assert got.count() == n_broader + n_label


def test_alternation_with_inverse_branch(kg):
    got = sorted(
        (r["x"], r["o"])
        for r in bgp_match_paths(kg, [("b", "broader|^broader", "?o")])
        .selectExpr("'b' as x", "o")
        .collect()
    )
    # b broader a, plus inverse: d broader b -> o=d
    assert got == [("b", "a"), ("b", "d")]


def test_alternation_rejects_closure_branch(kg):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alternation"):
        bgp_match_paths(kg, [("?x", "broader|label+", "?o")]).collect()


def test_alternation_invisible_to_variable_predicate(kg):
    got = bgp_match_paths(
        kg, [("?x", "broader|label", "?y"), ("?y", "?p", "?o")]
    ).collect()
    assert got and all("|" not in r["p"] for r in got)


def test_paths_in_exists_group(kg):
    # labelled concepts that ARE descendants of a (any number of hops)
    got = bgp_match_paths(
        kg,
        [("?x", "label", "?l")],
        exists=[[("?x", "broader+", "a")]],
    ).collect()
    assert sorted(r["x"] for r in got) == ["b", "c", "d"]


def test_union_paths_branches(kg):
    # bgp_union(paths=True): one closure-augmented scan shared by the
    # branches; 'broader+' resolves transitively, the plain branch is
    # untouched, and the solution is the bag union
    got = bgp_union(
        kg,
        [[("?x", "broader+", "a")], [("?x", "label", "root")]],
        paths=True,
    ).collect()
    # 'broader+' solutions are NODE PAIRS (SPARQL 1.1 path semantics:
    # the closure is a set), so the duplicate (c, broader, a) base edge
    # does not duplicate c; the plain label branch stays a bag
    assert sorted(r["x"] for r in got) == ["a", "b", "c", "d"]


def test_paths_in_not_exists_group(kg):
    # concepts with a label that are NOT descendants of a
    got = bgp_match_paths(
        kg,
        [("?x", "label", "?l")],
        not_exists=[[("?x", "broader+", "a")]],
    ).collect()
    assert sorted(r["x"] for r in got) == ["a"]


def test_construct_over_paths_materializes_ancestor_edges(kg):
    out = bgp_construct(
        kg,
        [("?x", "broader+", "?y")],
        [("?x", "ancestor", "?y")],
        paths=True,
    )
    got = {(r["subject"], r["object"]) for r in out.collect()}
    assert got == {
        ("b", "a"), ("c", "a"), ("d", "b"), ("d", "a"), ("e", "e"),
    }
    assert {r["predicate"] for r in out.collect()} == {"ancestor"}


def test_mixed_alternation_sequence_raises(kg):
    """SPARQL precedence makes 'a|b/c' mean a|(b/c); the flat splitter
    cannot express that, so the ambiguity is loud, not guessed."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mixed alternation"):
        bgp_match_paths(kg, [("?x", "broader|label/label", "?o")])


def test_caret_binds_tighter_than_alternation(kg):
    """'^a|b' is (^a)|b per the SPARQL grammar — the inverse applies to
    the a branch only, not the whole alternation."""
    got = sorted(
        (r["x"], r["o"])
        for r in bgp_match_paths(kg, [("?x", "^broader|label", "?o")])
        .collect()
    )
    inv = [(r["o"], r["x"]) for r in bgp_match(kg, [("?x", "broader", "?o")]).collect()]
    lab = [(r["x"], r["o"]) for r in bgp_match(kg, [("?x", "label", "?o")]).collect()]
    assert got == sorted(inv + lab)


@pytest.fixture(scope="module")
def iri_kg(spark):
    rows = [
        ("s1", "http://schema.org/name", "Alice"),
        ("s2", "http://schema.org/name", "Bob"),
        ("s1", "a^b|c", "weird"),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )


def test_iri_ref_predicate_is_opaque_in_paths(iri_kg):
    """'<...>'-wrapped constants shield real-world IRIs (which legally
    contain '/') from the path mini-grammar; the bare IRI is matched."""
    got = bgp_match_paths(
        iri_kg, [("?x", "<http://schema.org/name>", "?n")]
    ).collect()
    assert sorted(r["n"] for r in got) == ["Alice", "Bob"]
    # unwrapped, the same term is a path expression and raises on '//'
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty element"):
        bgp_match_paths(iri_kg, [("?x", "http://schema.org/name", "?n")])


def test_iri_ref_shields_path_metachars(iri_kg):
    got = bgp_match_paths(iri_kg, [("?x", "<a^b|c>", "?o")]).collect()
    assert [(r["x"], r["o"]) for r in got] == [("s1", "weird")]


def test_iri_ref_inverse_composes(iri_kg):
    got = bgp_match_paths(
        iri_kg, [("Alice", "^<http://schema.org/name>", "?s")]
    ).collect()
    assert [r["s"] for r in got] == ["s1"]


def test_iri_ref_in_plain_match_and_construct(iri_kg):
    got = bgp_match(iri_kg, [("?x", "<http://schema.org/name>", "?n")])
    assert got.count() == 2
    out = bgp_construct(
        iri_kg,
        [("?x", "<http://schema.org/name>", "?n")],
        [("?x", "<http://xmlns.com/foaf/0.1/name>", "?n")],
    ).collect()
    assert {r["predicate"] for r in out} == {"http://xmlns.com/foaf/0.1/name"}


def test_ask_true_false_and_lazy_shape(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_ask

    assert bgp_ask(kg, [("d", "broader", "?y")]).first()["ask"] is True
    assert bgp_ask(kg, [("a", "broader", "?y")]).first()["ask"] is False
    # paths + negation compose through the same matcher
    assert bgp_ask(kg, [("d", "broader+", "a")], paths=True).first()["ask"]
    assert (
        bgp_ask(
            kg, [("?x", "label", "?l")], not_exists=[[("?x", "broader", "?p")]]
        ).first()["ask"]
        is True
    )
    plan = (
        bgp_ask(kg, [("?x", "broader", "?y")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CollectLimit" in plan or "LocalLimit" in plan  # stops at 1 row


def test_describe_node_both_directions(kg):
    from ontology_mapping_spark.operators.kgquery import describe_node

    got = {
        (r["subject"], r["predicate"], r["object"])
        for r in describe_node(kg, "b").collect()
    }
    assert got == {
        ("b", "broader", "a"),
        ("d", "broader", "b"),
        ("b", "label", "left"),
    }
    assert describe_node(kg, "<b>").count() == describe_node(kg, "b").count()


# ---------------------------------------------------------------------------
# SELECT solution modifiers: BIND / GROUP BY-aggregates / HAVING / DISTINCT /
# ORDER BY / OFFSET-LIMIT (kgquery.bgp_select, kgquery.solution_modifiers)
# ---------------------------------------------------------------------------


def test_select_group_by_count_having_order_limit(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_select

    # children per parent, bag semantics: a has {b, c, c} (duplicate triple
    # counts twice), b has {d}, e has {e}
    rows = bgp_select(
        kg,
        [("?x", "broader", "?y")],
        group_by=["?y"],
        aggregates=[("count", "?x", "?n")],
        having="n >= 1",
        order_by=["?n DESC", "?y"],
        limit=2,
    ).collect()
    assert [(r["y"], r["n"]) for r in rows] == [("a", 3), ("b", 1)]


def test_select_global_aggregate_and_bind(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_select

    # no group_by -> one global row; BIND makes the string labels numeric
    row = bgp_select(
        kg,
        [("?x", "label", "?l")],
        bind=[("?ll", "CAST(length(l) AS DOUBLE)")],
        aggregates=[
            ("avg", "?ll", "?mean"),
            ("count", "*", "?cnt"),
            ("max", "?l", "?last"),
        ],
    ).first()
    assert row["cnt"] == 4
    assert row["mean"] == pytest.approx((4 + 4 + 5 + 4) / 4)
    assert row["last"] == "root"


def test_select_group_concat_sorted_and_sample_min(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_select

    rows = {
        r["y"]: (r["kids"], r["one"])
        for r in bgp_select(
            kg,
            [("?x", "broader", "?y")],
            group_by=["?y"],
            aggregates=[
                ("group_concat:;", "?x", "?kids"),
                ("sample", "?x", "?one"),
            ],
        ).collect()
    }
    # group_concat sorts the group (determinism pinned); sample is min
    assert rows["a"] == ("b;c;c", "b")
    assert rows["b"] == ("d", "d")


def test_select_count_var_skips_optional_nulls(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_select

    # every subject with a label, OPTIONAL broader: 'a' has no parent ->
    # NULL p; COUNT(?p) skips it, COUNT(*) does not
    row = bgp_select(
        kg,
        [("?x", "label", "?l")],
        optional=[[("?x", "broader", "?p")]],
        aggregates=[("count", "?p", "?with_parent"), ("count", "*", "?all")],
    ).first()
    # bag: c broader a twice -> c contributes two solutions
    assert (row["with_parent"], row["all"]) == (4, 5)


def test_select_distinct_order_offset_limit_slice(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_select

    rows = bgp_select(
        kg,
        [("?x", "broader", "?y")],
        select=["?x"],
        distinct=True,
        order_by=["?x"],
        offset=1,
        limit=2,
    ).collect()
    assert [r["x"] for r in rows] == ["c", "d"]  # of sorted {b,c,d,e}


def test_select_ordered_limit_is_take_ordered(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_select

    plan = (
        bgp_select(
            kg,
            [("?x", "broader", "?y")],
            select=["?x"],
            order_by=["?x"],
            limit=3,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # per-partition top-k + singleton merge, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_select_modifier_validation(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_select

    pats = [("?x", "broader", "?y")]
    with pytest.raises(ValueError, match="group_by without aggregates"):
        bgp_select(kg, pats, group_by=["?y"])
    with pytest.raises(ValueError, match="HAVING requires aggregation"):
        bgp_select(kg, pats, having="x > 1")
    with pytest.raises(ValueError, match="unknown aggregate"):
        bgp_select(kg, pats, aggregates=[("median", "?x", "?m")])
    with pytest.raises(ValueError, match="only valid with count"):
        bgp_select(kg, pats, aggregates=[("sum", "*", "?s")])
    with pytest.raises(ValueError, match="already bound"):
        bgp_select(kg, pats, bind=[("?x", "upper(y)")])
    with pytest.raises(ValueError, match="unbound variables"):
        bgp_select(kg, pats, group_by=["?z"], aggregates=[("count", "*", "?n")])
    with pytest.raises(ValueError, match="order_by key"):
        bgp_select(kg, pats, order_by=["?x SIDEWAYS"])
    with pytest.raises(ValueError, match="references unbound"):
        bgp_select(kg, pats, select=["?nope"])


def test_select_over_paths(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_select

    # ancestors per node through broader+ : d reaches {b, a}
    rows = {
        r["x"]: r["n"]
        for r in bgp_select(
            kg,
            [("?x", "broader+", "?a")],
            paths=True,
            group_by=["?x"],
            aggregates=[("count", "?a", "?n")],
        ).collect()
    }
    assert rows["d"] == 2 and rows["b"] == 1 and rows["c"] == 1


# ---------------------------------------------------------------------------
# SPARQL UPDATE: DELETE / INSERT WHERE (kgquery.update_graph)
# ---------------------------------------------------------------------------


def triple_set(df):
    return {(r["subject"], r["predicate"], r["object"]) for r in df.collect()}


def test_update_rename_predicate(kg):
    from ontology_mapping_spark.operators.kgquery import update_graph

    out = update_graph(
        kg,
        [("?x", "broader", "?y"), ("?x", "label", "?l")],
        delete=[("?x", "broader", "?y")],
        insert=[("?x", "parent", "?y")],
    )
    got = triple_set(out)
    # labeled subjects' broader edges retargeted; e (unlabeled) untouched
    assert ("b", "parent", "a") in got and ("b", "broader", "a") not in got
    assert ("e", "broader", "e") in got
    # duplicate (c, broader, a) removed in BOTH copies, inserted once
    assert out.filter(
        (F.col("subject") == "c") & (F.col("predicate") == "parent")
    ).count() == 1


def test_update_is_idempotent_and_set_semantic(kg):
    from ontology_mapping_spark.operators.kgquery import update_graph

    args = dict(
        patterns=[("?x", "broader", "?y"), ("?x", "label", "?l")],
        delete=[("?x", "broader", "?y")],
        insert=[("?x", "parent", "?y")],
    )
    once = update_graph(kg, args["patterns"], args["delete"], args["insert"])
    twice = update_graph(
        once,
        [("?x", "parent", "?y"), ("?x", "label", "?l")],
        delete=[("?x", "parent", "?y")],
        insert=[("?x", "parent", "?y")],
    )
    assert triple_set(once) == triple_set(twice)
    assert once.count() == twice.count()  # multiplicities stable too


def test_update_delete_where_shorthand(kg):
    from ontology_mapping_spark.operators.kgquery import update_graph

    out = update_graph(kg, [("?x", "broader", "a")])
    got = triple_set(out)
    assert ("b", "broader", "a") not in got and ("c", "broader", "a") not in got
    assert ("d", "broader", "b") in got and ("a", "label", "root") in got
    with pytest.raises(ValueError, match="DELETE WHERE shorthand"):
        update_graph(kg, [("?x", "broader+", "a")], paths=True)


def test_update_insert_normalizes_multiplicity(kg):
    from ontology_mapping_spark.operators.kgquery import update_graph

    # inserting an already-duplicated triple collapses it to one copy
    out = update_graph(
        kg,
        [("c", "broader", "?y")],
        insert=[("c", "broader", "?y")],
    )
    assert out.filter(
        (F.col("subject") == "c") & (F.col("predicate") == "broader")
    ).count() == 1
    # everything else untouched
    assert out.count() == kg.count() - 1


def test_update_anti_join_broadcasts(kg):
    from ontology_mapping_spark.operators.kgquery import update_graph

    plan = (
        update_graph(kg, [("?x", "broader", "a")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_subselect_composes_via_values(kg):
    # SPARQL 1.1 sub-SELECT: the inner query's solutions feed the outer
    # BGP as its VALUES block (broadcast inner join) — {SELECT ?y WHERE
    # {?x broader ?y} GROUP BY ?y ORDER BY COUNT desc LIMIT 1} then the
    # outer {?y label ?l}
    from ontology_mapping_spark.operators.kgquery import bgp_match, bgp_select

    inner = bgp_select(
        kg,
        [("?x", "broader", "?y")],
        group_by=["?y"],
        aggregates=[("count", "?x", "?n")],
        order_by=["?n DESC", "?y"],
        limit=1,
    ).select("y")
    rows = bgp_match(kg, [("?y", "label", "?l")], values=inner).collect()
    assert [(r["y"], r["l"]) for r in rows] == [("a", "root")]


# ---------------------------------------------------------------------------
# Named graphs: 4-term (g, s, p, o) patterns over a quad table
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        ("g1", "b", "broader", "a"),
        ("g1", "c", "broader", "a"),
        ("g2", "d", "broader", "b"),
        ("g1", "a", "label", "root"),
        ("g2", "a", "label", "wurzel"),
    ]
    return spark.createDataFrame(
        rows, "graph string, subject string, predicate string, object string"
    ).cache()


def test_graph_constant_scopes_the_scan(quads):
    got = {
        r["x"]
        for r in bgp_match(quads, [("g1", "?x", "broader", "?y")]).collect()
    }
    assert got == {"b", "c"}


def test_graph_variable_binds_and_triple_pattern_unions(quads):
    rows = bgp_match(quads, [("?g", "a", "label", "?l")]).collect()
    assert {(r["g"], r["l"]) for r in rows} == {("g1", "root"), ("g2", "wurzel")}
    # a 3-term pattern over the quad table reads the union of graphs
    assert bgp_match(quads, [("a", "label", "?l")]).count() == 2


def test_shared_graph_variable_joins_within_one_graph(quads):
    # both patterns must hold in the SAME graph: only g1 has both a
    # broader edge and the root label
    rows = bgp_match(
        quads, [("?g", "?x", "broader", "a"), ("?g", "a", "label", "?l")]
    ).collect()
    assert {(r["g"], r["x"], r["l"]) for r in rows} == {
        ("g1", "b", "root"),
        ("g1", "c", "root"),
    }


def test_graph_aggregation_via_select(quads):
    from ontology_mapping_spark.operators.kgquery import bgp_select

    rows = {
        r["g"]: r["n"]
        for r in bgp_select(
            quads,
            [("?g", "?s", "?p", "?o")],
            group_by=["?g"],
            aggregates=[("count", "*", "?n")],
        ).collect()
    }
    assert rows == {"g1": 3, "g2": 2}


def test_graph_pattern_requires_graph_column(kg):
    with pytest.raises(ValueError, match="needs a 'graph' column"):
        bgp_match(kg, [("?g", "?x", "broader", "?y")])


def test_graph_pattern_rejected_in_paths_and_templates(quads):
    from ontology_mapping_spark.operators.kgquery import bgp_construct

    with pytest.raises(ValueError, match="default graph"):
        bgp_match_paths(quads, [("?g", "?x", "broader+", "?y")])
    with pytest.raises(ValueError, match="templates emit triples"):
        bgp_construct(
            quads,
            [("?g", "?x", "broader", "?y")],
            [("?g", "?x", "within", "?y")],
        )


def test_update_graph_rejects_quad_tables(quads):
    from ontology_mapping_spark.operators.kgquery import update_graph

    with pytest.raises(ValueError, match="triple-scoped"):
        update_graph(quads, [("?x", "broader", "?y")])


def test_apply_update_rejects_quad_tables(quads, spark):
    # the UNION-WHERE route (sparql_text._apply_where_update) reaches
    # apply_update directly, bypassing update_graph's guard — it must
    # refuse quad tables itself, not silently delete from every graph
    from ontology_mapping_spark.operators.kgquery import apply_update

    sols = spark.createDataFrame([("a", "b")], "x string, y string")
    with pytest.raises(ValueError, match="triple-scoped"):
        apply_update(quads, sols, delete=[("?x", "broader", "?y")])


# --------------------------------------------------------------------------
# zero-or-one paths ('p?') and negated property sets ('!p', '!(a|^b)')
# --------------------------------------------------------------------------

def test_zero_or_one_path(kg):
    # c broader? ?o: the base edge (duplicate collapses — path semantics
    # are distinct node pairs) plus the zero-length identity
    got = bgp_match_paths(kg, [("c", "broader?", "?o")]).collect()
    assert sorted(r["o"] for r in got) == ["a", "c"]
    # the e->e self-loop must not double with its identity row
    got2 = bgp_match_paths(kg, [("e", "broader?", "?o")]).collect()
    assert [r["o"] for r in got2] == ["e"]


def test_zero_or_one_requires_plain_base(kg):
    with pytest.raises(ValueError, match="must follow"):
        bgp_match_paths(kg, [("?x", "broader+?", "?o")]).collect()


def test_negated_property_set_forward(kg):
    # !broader = every edge whose predicate is not 'broader' = the labels
    got = bgp_match_paths(kg, [("?x", "!broader", "?o")])
    want = bgp_match(kg, [("?x", "label", "?o")])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_negated_property_set_parenthesized_and_inverse(kg):
    # every predicate is excluded: nothing matches
    assert bgp_match_paths(kg, [("?x", "!(broader|label)", "?o")]).count() == 0
    # pure-inverse set: reversed edges not labeled 'label' = reversed
    # broader scans, bag semantics (the duplicate c->a edge stays doubled)
    got = bgp_match_paths(kg, [("?x", "!(^label)", "?o")]).collect()
    pairs = sorted((r["x"], r["o"]) for r in got)
    assert pairs == [("a", "b"), ("a", "c"), ("a", "c"), ("b", "d"), ("e", "e")]
    # mixed: forward non-label plus reversed non-label
    both = bgp_match_paths(kg, [("?x", "!(label|^label)", "?o")])
    assert both.count() == 10


def test_nps_loud_errors(kg):
    with pytest.raises(ValueError, match="negated property set members"):
        bgp_match_paths(kg, [("?x", "!(broader+)", "?o")]).collect()
    with pytest.raises(ValueError, match="composite path"):
        bgp_match_paths(kg, [("?x", "a!b", "?o")]).collect()
    with pytest.raises(ValueError, match="closure over a negated"):
        bgp_match_paths(kg, [("?x", "!broader+", "?o")]).collect()


def test_nps_complement_filter_pushes_to_parquet_scan(kg, spark, tmp_path):
    # the negated-property-set scan must push Not(In(predicate, ...)) to
    # the data source — at 10^12 triples the complement scan prunes at
    # the reader, not post-scan
    path = str(tmp_path / "triples_nps_parquet")
    kg.write.mode("overwrite").parquet(path)
    scanned = spark.read.parquet(path)
    plan = (
        bgp_match_paths(scanned, [("?x", "!(broader|label)", "?o")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan, plan
    assert "Not(In(predicate" in plan, plan


def test_construct_blank_node_templates(kg):
    from ontology_mapping_spark.operators.kgquery import (
        bgp_construct,
        update_graph,
    )

    out = bgp_construct(
        kg,
        [("?x", "broader", "a")],
        [("_:m", "mention_of", "?x"), ("_:m", "kind", "link")],
    ).collect()
    by_pred = {}
    for r in out:
        by_pred.setdefault(r["predicate"], []).append(r)
    # one fresh node per solution (b and c), shared across the template
    # triples of that solution
    of_nodes = {r["subject"] for r in by_pred["mention_of"]}
    kind_nodes = {r["subject"] for r in by_pred["kind"]}
    assert len(of_nodes) == 2 and of_nodes == kind_nodes
    assert all(n.startswith("_:m_") for n in of_nodes)
    # deterministic: a re-run mints the same ids
    again = bgp_construct(
        kg,
        [("?x", "broader", "a")],
        [("_:m", "mention_of", "?x"), ("_:m", "kind", "link")],
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # distinct labels in one solution mint distinct nodes
    two = bgp_construct(
        kg, [("d", "broader", "?y")], [("_:a", "p", "_:b")]
    ).first()
    assert two["subject"] != two["object"]
    # blank nodes are illegal in DELETE templates
    with pytest.raises(ValueError, match="DELETE template"):
        update_graph(
            kg, [("?x", "broader", "a")], delete=[("_:m", "broader", "a")]
        )


def test_alternation_rejects_optional_and_nps_branches(kg):
    with pytest.raises(ValueError, match="zero-or-one inside alternation"):
        bgp_match_paths(kg, [("?x", "broader?|label", "?o")]).collect()
    with pytest.raises(ValueError, match="ambiguous '!'"):
        bgp_match_paths(kg, [("?x", "!broader|label", "?o")]).collect()
    with pytest.raises(ValueError, match="negated property set inside"):
        bgp_match_paths(kg, [("?x", "label|!broader", "?o")]).collect()


def test_bnode_minting_distinguishes_null_positions(kg, spark):
    from ontology_mapping_spark.operators.kgquery import _instantiate_templates

    # xxhash64 folds NULL args into nothing; the JSON-seeded mint must
    # give (x='a', y=NULL) and (x=NULL, y='a') DIFFERENT blank nodes
    sols = spark.createDataFrame([("a", None), (None, "a")], "x string, y string")
    out = _instantiate_templates(sols, [("_:m", "p", "c")]).collect()
    assert len({r["subject"] for r in out}) == 2


def test_ground_data_rejects_blank_nodes(kg):
    from ontology_mapping_spark.operators.kgquery import delete_data, insert_data

    with pytest.raises(ValueError, match="blank node"):
        delete_data(kg, [("_:b", "broader", "a")])
    with pytest.raises(ValueError, match="blank node"):
        insert_data(kg, [("x", "broader", "_:b")])


def test_update_quads_scopes_one_graph(spark):
    from ontology_mapping_spark.operators.kgquery import update_quads

    quads = spark.createDataFrame(
        [
            ("g1", "b", "broader", "a"),
            ("g1", "c", "broader", "a"),
            ("g2", "b", "broader", "a"),
            (None, "x", "label", "loose"),
        ],
        "graph string, subject string, predicate string, object string",
    )
    out = update_quads(
        quads,
        "g1",
        [("?x", "broader", "a")],
        delete=[("?x", "broader", "a")],
        insert=[("a", "narrower", "?x")],
    )
    got = sorted((tuple(r) for r in out.collect()), key=str)
    assert got == [
        ("g1", "a", "narrower", "b"),
        ("g1", "a", "narrower", "c"),
        ("g2", "b", "broader", "a"),         # other graph untouched
        (None, "x", "label", "loose"),       # null-graph rows preserved
    ]
    with pytest.raises(ValueError, match="quad table"):
        update_quads(
            quads.drop("graph"), "g1", [("?x", "broader", "a")]
        )


# ------------------------------------------- statistics-driven join order


def test_predicate_stats_counts(kg):
    from ontology_mapping_spark.operators.kgquery import predicate_stats

    assert predicate_stats(kg) == {"broader": 5, "label": 4}


def test_stats_order_high_cardinality_predicate_joins_late(spark):
    """The constants-count heuristic ties a (?s, type, ?c) pattern with a
    (?s, rare, ?o) one; with per-predicate stats the rare scan must seed
    the join (left-most in the plan) even when the huge pattern comes
    first in the query text — the 10^12-triple inversion the VERDICT
    called out."""
    from ontology_mapping_spark.operators.kgquery import predicate_stats

    rows = [(f"s{i}", "type", f"c{i % 3}") for i in range(300)]
    rows += [(f"s{i}", "rare", f"o{i}") for i in range(3)]
    kg = spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )
    stats = predicate_stats(kg)
    pats = [("?s", "type", "?c"), ("?s", "rare", "?o")]  # huge FIRST
    legacy = bgp_match(kg, pats)
    tuned = bgp_match(kg, pats, stats=stats)
    # identical solutions either way
    key = lambda r: (r["s"], r["c"], r["o"])  # noqa: E731
    want = sorted(map(key, legacy.collect()))
    assert sorted(map(key, tuned.collect())) == want
    assert len(want) == 3
    # plan order: the left (seed) child prints first in the join tree.
    # Legacy seeds the huge 'type' scan (input order on the 1-constant
    # tie); stats must seed 'rare'.
    legacy_plan = legacy._jdf.queryExecution().optimizedPlan().toString()
    tuned_plan = tuned._jdf.queryExecution().optimizedPlan().toString()
    assert legacy_plan.index("type") < legacy_plan.index("rare")
    assert tuned_plan.index("rare") < tuned_plan.index("type")


def test_stats_order_extra_constants_still_win(spark):
    """A 2-constant pattern over the huge predicate estimates below the
    1-constant rare one only when its damped estimate is actually smaller
    — here 300 * 0.1 = 30 > 3, so rare still seeds; and stats must flow
    into OPTIONAL/EXISTS groups without changing their results."""
    from ontology_mapping_spark.operators.kgquery import predicate_stats

    rows = [(f"s{i}", "type", f"c{i % 3}") for i in range(300)]
    rows += [(f"s{i}", "rare", f"o{i}") for i in range(3)]
    rows += [("s1", "label", "one")]
    kg = spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )
    stats = predicate_stats(kg)
    got = bgp_match(
        kg,
        [("?s", "type", "c1"), ("?s", "rare", "?o")],
        optional=[[("?s", "label", "?l")]],
        exists=[[("?s", "type", "?any")]],
        stats=stats,
    ).collect()
    assert sorted((r["s"], r["o"], r["l"]) for r in got) == [
        ("s1", "o1", "one")
    ]


def test_estimate_predicate_path_terms_are_not_empty_scans():
    """Synthetic path terms ('p+', 'p*', 'p?', '^p', 'a|b', '!(...)') must
    estimate from their member predicates' base counts — est 0 (the
    truly-absent-predicate case) would seed the join order with the
    LARGEST relation in the query, the exact misordering the stats
    feature exists to prevent."""
    from ontology_mapping_spark.operators.kgquery import _estimate_predicate

    stats = {"type": 300.0, "rare": 3.0}
    total = 303.0
    est = lambda p: _estimate_predicate(p, stats, total)  # noqa: E731
    # closure >= base, identity variants add ~total, inverse == base
    assert est("type+") >= est("type") == 300.0
    assert est("type*") >= est("type+")
    assert est("type?") >= est("type") + total - 1
    assert est("^type") == est("type")
    assert est("^type+") == est("type+")
    # alternation sums branches; negated set complements
    assert est("type|rare") == 303.0
    assert est("!type") == 3.0
    assert est("!(type|rare)") == 0.0
    # a genuinely absent plain predicate IS an empty scan
    assert est("absent") == 0.0
    assert est("<http://x/absent>") == 0.0
    # '<iri>'-wrapped terms are opaque: no path interpretation
    assert est("<http://x/a+b>") == 0.0


def test_stats_order_path_closure_joins_late(spark):
    """With stats on, a 'broader+' closure pattern (over the dominant
    predicate) must NOT seed the join ahead of a selective constant
    pattern — the closure relation is estimated >= its base, never as
    the empty scan its synthetic predicate name would suggest."""
    from ontology_mapping_spark.operators.kgquery import (
        bgp_match_paths,
        predicate_stats,
    )

    # a 'broader' chain of 60 nodes (closure ~ 60*59/2 pairs under
    # max_iters) + 2 'rare' rows
    rows = [(f"n{i}", "broader", f"n{i + 1}") for i in range(60)]
    rows += [("n0", "rare", "hit"), ("n999", "rare", "miss")]
    kg = spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )
    stats = predicate_stats(kg)
    pats = [("?x", "broader+", "?a"), ("?x", "rare", "hit")]
    tuned = bgp_match_paths(kg, pats, stats=stats, max_iters=8)
    legacy = bgp_match_paths(kg, pats, max_iters=8)
    key = lambda r: (r["x"], r["a"])  # noqa: E731
    want = sorted(map(key, legacy.collect()))
    assert sorted(map(key, tuned.collect())) == want
    assert len(want) == 60  # n0 reaches every deeper node
    # the 2-constant rare pattern estimates 3*0.1 < closure est; it must
    # seed (left-most) in the stats plan
    plan = tuned._jdf.queryExecution().optimizedPlan().toString()
    assert plan.index("rare") < plan.index("broader")


def test_values_undef_is_wildcard(kg):
    """UNDEF (None) in a shared VALUES variable is a compatibility
    WILDCARD per SPARQL 18.2.4.3 — a plain equi-join would drop the row
    (NULL never equals anything) and silently empty the result."""
    got = bgp_match(
        kg,
        [("?x", "label", "?l")],
        values=[{"x": None, "tag": "ANY"}, {"x": "b", "tag": "B"}],
    ).collect()
    rows = sorted((r["x"], r["l"], r["tag"]) for r in got)
    # the UNDEF row extends EVERY solution; the bound row only x=b
    assert ("a", "root", "ANY") in rows
    assert ("b", "left", "ANY") in rows and ("b", "left", "B") in rows
    assert ("c", "right", "ANY") in rows and ("d", "leaf", "ANY") in rows
    assert len(rows) == 4 + 1  # 4 labelled nodes * wildcard + 1 bound


def test_values_all_undef_column_and_empty_rows(kg, spark):
    """A variable that is UNDEF in every row is legal SPARQL (schema
    inference would crash); bare empty rows raise an informative error;
    a 0-row DataFrame VALUES yields zero solutions."""
    import pytest

    from ontology_mapping_spark.operators.kgquery import values_frame

    got = bgp_match(
        kg,
        [("?x", "label", "?l")],
        values=[{"x": "b", "y": None}],
    ).collect()
    assert [(r["x"], r["y"]) for r in got] == [("b", None)]
    with pytest.raises(ValueError, match="empty VALUES"):
        values_frame(spark, [])
    empty = spark.createDataFrame([], "x string")
    assert bgp_match(kg, [("?x", "label", "?l")], values=empty).count() == 0


def test_bracketed_iri_path_composites(spark):
    """'<a>|<b>' / '<http://a>/<http://b>' are composite PATH terms, not
    one opaque iri (brackets are illegal inside an IRI) — treating them
    as one predicate constant silently matched nothing."""
    kg2 = spark.createDataFrame(
        [
            ("s1", "http://x/p", "m"),
            ("m", "http://x/q", "o1"),
            ("s2", "http://x/q", "o2"),
        ],
        "subject string, predicate string, object string",
    )
    # alternation of bracketed iris (iris contain '/')
    alt = bgp_match_paths(
        kg2, [("?s", "<http://x/p>|<http://x/q>", "?o")]
    ).collect()
    assert sorted((r["s"], r["o"]) for r in alt) == [
        ("m", "o1"), ("s1", "m"), ("s2", "o2"),
    ]
    # two-hop sequence of bracketed iris
    seq = bgp_match_paths(
        kg2, [("?s", "<http://x/p>/<http://x/q>", "?o")]
    ).collect()
    assert [(r["s"], r["o"]) for r in seq] == [("s1", "o1")]
