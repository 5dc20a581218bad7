"""SPARQL text front-end (operators/sparql_text): each supported construct
parsed from real SPARQL text must produce the same result set as the
hand-built kgquery algebra call — the algebra is the oracle."""

from __future__ import annotations

import pytest

from ontology_mapping_spark.operators.sparql_text import (
    SparqlSyntaxError,
    sparql,
    sparql_update,
)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def kg(spark):
    data = [
        ("b", "broader", "a"),
        ("c", "broader", "a"),
        ("d", "broader", "b"),
        ("a", "label", "root"),
        ("b", "label", "left"),
        ("c", "label", "right"),
        ("d", "label", "leaf"),
        ("c", "broader", "a"),  # duplicate: bag semantics
        ("http://x.org/e", "broader", "b"),
    ]
    return spark.createDataFrame(
        data, "subject string, predicate string, object string"
    ).cache()


def test_select_bgp_matches_algebra(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_match

    got = sparql(kg, "SELECT ?x ?l WHERE { ?x broader a . ?x label ?l . }")
    want = bgp_match(
        kg, [("?x", "broader", "a"), ("?x", "label", "?l")], select=["?x", "?l"]
    )
    assert rows(got) == rows(want)


def test_optional_filter_not_exists_minus(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_match

    q = """SELECT ?x ?p WHERE {
        ?x label ?l .
        OPTIONAL { ?x broader ?p . }
        FILTER(STRLEN(?l) >= 4)
        FILTER NOT EXISTS { ?x broader b . }
    }"""
    got = sparql(kg, q)
    want = bgp_match(
        kg,
        [("?x", "label", "?l")],
        optional=[[("?x", "broader", "?p")]],
        filter_expr=["length(l) >= 4"],
        not_exists=[[("?x", "broader", "b")]],
        select=["?x", "?p"],
    )
    assert rows(got) == rows(want)
    got_minus = sparql(
        kg, "SELECT ?x WHERE { ?x label ?l . MINUS { ?x broader a . } }"
    )
    want_minus = bgp_match(
        kg, [("?x", "label", "?l")], minus=[[("?x", "broader", "a")]],
        select=["?x"],
    )
    assert rows(got_minus) == rows(want_minus)


def test_optional_with_body_filter(kg):
    # OPTIONAL { ... FILTER(...) }: the filter scopes to the body, so a
    # failing filter null-pads instead of dropping the outer solution
    got = sparql(
        kg,
        """SELECT ?x ?p WHERE {
            ?x label ?l .
            OPTIONAL { ?x broader ?p . FILTER(?p = "a") }
        } ORDER BY ?x""",
    ).collect()
    # b, c broader a -> bound (c twice: dup edge); a, d -> null-padded
    # (d's parent is b, filtered out of the BODY, not the solution)
    assert [(r["x"], r["p"]) for r in got] == [
        ("a", None), ("b", "a"), ("c", "a"), ("c", "a"), ("d", None),
    ]


def test_filter_exists(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_match

    got = sparql(
        kg,
        "SELECT ?x WHERE { ?x label ?l . FILTER EXISTS { ?x broader ?p . } }",
    )
    want = bgp_match(
        kg,
        [("?x", "label", "?l")],
        exists=[[("?x", "broader", "?p")]],
        select=["?x"],
    )
    assert rows(got) == rows(want)
    assert sorted(r["x"] for r in got.collect()) == ["b", "c", "d"]


def test_aggregates_group_by_having_order_limit(kg):
    q = """SELECT ?y (COUNT(*) AS ?n) (GROUP_CONCAT(?x; SEPARATOR=";") AS ?kids)
    WHERE { ?x broader ?y . }
    GROUP BY ?y HAVING(?n >= 1) ORDER BY DESC(?n) ?y LIMIT 2"""
    got = sparql(kg, q).collect()
    assert [(r["y"], r["n"], r["kids"]) for r in got] == [
        ("a", 3, "b;c;c"),
        ("b", 2, "d;http://x.org/e"),
    ]


def test_count_distinct_and_bind_projection(kg):
    got = sparql(
        kg,
        """SELECT (COUNT(DISTINCT ?x) AS ?nx) (AVG(?ll) AS ?mean) WHERE {
            ?x label ?l . BIND(CAST(STRLEN(?l) AS DOUBLE) AS ?ll)
        }""",
    ).first()
    assert got["nx"] == 4
    assert got["mean"] == pytest.approx(17 / 4)


def test_distinct_inside_aggregates(kg):
    got = sparql(
        kg,
        """SELECT ?y (COUNT(?x) AS ?n)
                  (GROUP_CONCAT(DISTINCT ?x; SEPARATOR=";") AS ?kids)
           WHERE { ?x broader ?y . } GROUP BY ?y ORDER BY ?y""",
    ).collect()
    # the duplicate c edge collapses in the DISTINCT concat, not the count
    assert [(r["y"], r["n"], r["kids"]) for r in got] == [
        ("a", 3, "b;c"),
        ("b", 2, "d;http://x.org/e"),
    ]
    got2 = sparql(
        kg,
        """SELECT (SUM(DISTINCT ?ll) AS ?s) (AVG(DISTINCT ?ll) AS ?m)
                  (MIN(DISTINCT ?ll) AS ?lo)
           WHERE { ?x label ?l . BIND(CAST(STRLEN(?l) AS INT) AS ?ll) }""",
    ).first()
    # label lengths 4,4,5,4 -> distinct {4,5}
    assert (got2["s"], got2["m"], got2["lo"]) == (9, 4.5, 4)


def test_distinct_order_offset(kg):
    got = sparql(
        kg,
        "SELECT DISTINCT ?x WHERE { ?x broader ?y . } ORDER BY ?x OFFSET 1 LIMIT 2",
    ).collect()
    assert [r["x"] for r in got] == ["c", "d"]


def test_property_paths_and_iri_terms(kg):
    from ontology_mapping_spark.operators.kgquery import bgp_match_paths

    got = sparql(kg, "SELECT ?a WHERE { d broader+ ?a . }")
    want = bgp_match_paths(kg, [("d", "broader+", "?a")], select=["?a"])
    assert rows(got) == rows(want)
    # <iri> subject passes through the bracket escape
    got2 = sparql(kg, "SELECT ?a WHERE { <http://x.org/e> broader/broader ?a . }")
    assert [r["a"] for r in got2.collect()] == ["a"]


def test_union_with_modifiers(kg):
    got = sparql(
        kg,
        """SELECT ?x WHERE {
            { ?x broader a . } UNION { ?x label root . }
        } ORDER BY ?x""",
    ).collect()
    assert [r["x"] for r in got] == ["a", "b", "c", "c"]  # bag union


def test_union_with_property_paths(kg):
    # a path predicate inside a UNION branch must resolve through the
    # closure, not match as a literal predicate (the silent-mis-answer
    # this pins: 'broader+' used to bind zero rows in a union branch)
    got = sparql(
        kg,
        """SELECT ?x WHERE {
            { ?x broader+ a . } UNION { ?x label root . }
        } ORDER BY ?x""",
    ).collect()
    # descendants of a: b, c, d, http://x.org/e (path solutions are
    # node pairs — the duplicate c edge collapses in the closure);
    # label root: a
    assert [r["x"] for r in got] == ["a", "b", "c", "d", "http://x.org/e"]
    # a sequence path binds reserved existentials that must not leak or
    # null-pad into the other branch
    got2 = sparql(
        kg,
        """SELECT ?x ?l WHERE {
            { ?x broader/broader ?g . } UNION { ?x label ?l . } }""",
    )
    assert sorted(got2.columns) == ["l", "x"]


def test_ask_over_union(kg):
    t = sparql(kg, "ASK { { ?x broader+ a . } UNION { ?x label nope . } }")
    assert t.first()["ask"] is True
    f = sparql(kg, "ASK { { ?x broader zzz . } UNION { ?x label nope . } }")
    assert f.first()["ask"] is False


def test_values_inline_restricts(kg):
    # (real UNDEF coverage lives in test_values_undef_wildcard_text)
    got = sparql(
        kg,
        """SELECT ?x ?l WHERE {
            ?x label ?l . VALUES ?x { b d }
        } ORDER BY ?x""",
    ).collect()
    assert [(r["x"], r["l"]) for r in got] == [("b", "left"), ("d", "leaf")]


def test_ask_construct_describe(kg):
    assert sparql(kg, "ASK { d broader b . }").first()["ask"] is True
    assert sparql(kg, "ASK WHERE { a broader ?y . }").first()["ask"] is False
    derived = sparql(
        kg,
        "CONSTRUCT { ?x grandparent ?z . } WHERE { ?x broader ?y . ?y broader ?z . }",
    )
    assert rows(derived) == [("d", "grandparent", "a"),
                             ("http://x.org/e", "grandparent", "a")]
    # b appears in 4 triples: broader->a, label, and two inbound broader
    assert sparql(kg, "DESCRIBE b").count() == 4


def test_construct_where_shorthand(kg):
    got = sparql(kg, "CONSTRUCT WHERE { ?x broader ?y . ?x label ?l . }")
    want = sparql(
        kg,
        """CONSTRUCT { ?x broader ?y . ?x label ?l . }
           WHERE { ?x broader ?y . ?x label ?l . }""",
    )
    assert rows(got) == rows(want)
    for q, msg in [
        ("CONSTRUCT WHERE { ?x broader ?y . FILTER(?y = \"a\") }", "plain"),
        ("CONSTRUCT WHERE { ?x broader+ ?y . }", "paths"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            sparql(kg, q)


def test_describe_node_set_and_var_form(kg):
    # multi-node: each touched triple once, even when both nodes touch it
    assert sparql(kg, "DESCRIBE b d").count() == 5
    # var form: x in {b, c}; bag multiplicity preserved (dup c edge)
    got = sparql(kg, "DESCRIBE ?x WHERE { ?x broader a . }")
    assert got.count() == 7
    # mixed constants and vars
    both = sparql(kg, "DESCRIBE d ?x WHERE { ?x broader a . }")
    assert both.count() == 8  # adds d's label; d broader b already counted
    for q, msg in [
        ("DESCRIBE ?x", "WHERE group"),
        ("DESCRIBE", "at least one"),
        ("DESCRIBE a b WHERE { ?x broader a . }", "at least one .var"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            sparql(kg, q)


def test_prefix_expansion_and_raw_qnames(spark):
    kg = spark.createDataFrame(
        [
            ("http://x.org/s", "http://x.org/p", "p:1"),
            ("p:1", "label", "one"),
        ],
        "subject string, predicate string, object string",
    )
    # declared prefix expands; undeclared qname (p:1) stays a raw constant
    got = sparql(
        kg,
        """PREFIX ex: <http://x.org/>
        SELECT ?o ?l WHERE { ex:s ex:p ?o . ?o label ?l . }""",
    ).first()
    assert (got["o"], got["l"]) == ("p:1", "one")


def test_graph_patterns(spark):
    quads = spark.createDataFrame(
        [
            ("g1", "b", "broader", "a"),
            ("g2", "d", "broader", "b"),
            ("g1", "a", "label", "root"),
        ],
        "graph string, subject string, predicate string, object string",
    )
    got = sparql(
        quads, "SELECT ?g ?x WHERE { GRAPH ?g { ?x broader ?y . } } ORDER BY ?g"
    ).collect()
    assert [(r["g"], r["x"]) for r in got] == [("g1", "b"), ("g2", "d")]
    got2 = sparql(quads, "SELECT ?x WHERE { GRAPH g1 { ?x broader ?y . } }")
    assert [r["x"] for r in got2.collect()] == ["b"]


def test_po_list_abbreviations(kg):
    # ';' shares the subject, ',' shares subject+predicate; trailing ';'
    # and empty ';' slots are grammar-legal; all desugar to full triples
    full = sparql(
        kg,
        "SELECT ?x ?l ?p WHERE { ?x broader ?p . ?x label ?l . }",
    )
    for q in [
        "SELECT ?x ?l ?p WHERE { ?x broader ?p ; label ?l . }",
        "SELECT ?x ?l ?p WHERE { ?x broader ?p ; ; label ?l ; }",
        "SELECT ?x ?l ?p WHERE { ?x broader ?p; label ?l. }",
    ]:
        assert rows(sparql(kg, q)) == rows(full)
    # ',' object list
    got = sparql(kg, "SELECT ?x WHERE { ?x broader a , b . }")
    want = sparql(kg, "SELECT ?x WHERE { ?x broader a . ?x broader b . }")
    assert rows(got) == rows(want)
    # abbreviations inside a CONSTRUCT template and a GRAPH block
    derived = sparql(
        kg,
        "CONSTRUCT { ?x kid_of ?y ; seen yes . } WHERE { ?x broader ?y . }",
    )
    assert ("d", "seen", "yes") in rows(derived)
    assert ("d", "kid_of", "b") in rows(derived)


def test_po_list_in_graph_block(spark):
    quads = spark.createDataFrame(
        [
            ("g1", "b", "broader", "a"),
            ("g1", "b", "label", "left"),
        ],
        "graph string, subject string, predicate string, object string",
    )
    got = sparql(
        quads, "SELECT ?x ?l WHERE { GRAPH g1 { ?x broader a ; label ?l . } }"
    ).collect()
    assert [(r["x"], r["l"]) for r in got] == [("b", "left")]


def test_update_data_forms(kg):
    base = rows(kg)
    # INSERT DATA: idempotent set semantics (duplicate of an existing
    # triple collapses to one copy; brand-new triples appear once)
    up = sparql_update(
        kg, 'INSERT DATA { d broader b . z label "new thing" . }'
    )
    got = rows(up)
    assert got.count(("d", "broader", "b")) == 1
    assert ("z", "label", "new thing") in got
    assert len(got) == len(base) + 1
    # DELETE DATA removes every copy (c broader a is duplicated in kg)
    down = sparql_update(kg, "DELETE DATA { c broader a . }")
    got2 = rows(down)
    assert ("c", "broader", "a") not in got2
    assert len(got2) == len(base) - 2


def test_update_where_forms(kg):
    from ontology_mapping_spark.operators.kgquery import update_graph

    # DELETE WHERE shorthand
    got = sparql_update(kg, "DELETE WHERE { ?x broader a . }")
    want = update_graph(kg, [("?x", "broader", "a")])
    assert rows(got) == rows(want)
    # rename idiom: DELETE { } INSERT { } WHERE { } with a FILTER
    q = """DELETE { ?x broader ?y . }
    INSERT { ?x narrower_of ?y ; rewritten yes . }
    WHERE { ?x broader ?y . FILTER(?y = "a") }"""
    got2 = rows(sparql_update(kg, q))
    assert ("b", "narrower_of", "a") in got2
    assert ("b", "rewritten", "yes") in got2
    assert ("b", "broader", "a") not in got2
    assert ("d", "broader", "b") in got2  # untouched
    # INSERT-only WHERE form
    got3 = rows(
        sparql_update(kg, "INSERT { ?y has_kid ?x . } WHERE { ?x broader ?y . }")
    )
    assert ("a", "has_kid", "b") in got3


def test_update_where_union_bind_subselect(kg):
    # whole-group UNION WHERE with explicit templates: delete everything
    # matched by either branch (bgp_union solutions through apply_update)
    got = rows(sparql_update(
        kg,
        """DELETE { ?x broader ?y . ?x label ?y . }
           WHERE { { ?x broader ?y . } UNION { ?x label ?y . } }""",
    ))
    assert got == []
    # BIND in the WHERE mints a computed value the INSERT template uses
    got2 = sparql_update(
        kg,
        """DELETE { } INSERT { ?x tag ?t . }
           WHERE { ?x broader a . BIND(CONCAT("n-", ?x) AS ?t) }""",
    ).filter("predicate = 'tag'")
    assert rows(got2) == [("b", "tag", "n-b"), ("c", "tag", "n-c")]
    # sub-SELECT in the WHERE joins its aggregate into the solutions
    got3 = sparql_update(
        kg,
        """DELETE { ?x broader ?y . }
           WHERE { ?x broader ?y .
                   { SELECT ?y (COUNT(*) AS ?n) WHERE { ?z broader ?y . }
                     GROUP BY ?y }
                   FILTER(?n >= 3) }""",
    )
    preds = rows(got3.filter("predicate = 'broader'"))
    # only parent a has >= 3 inbound edges (b, c x2): those drop
    assert preds == [
        ("d", "broader", "b"),
        ("http://x.org/e", "broader", "b"),
    ]
    # spec guards stay loud: shorthand and WITH-scoped restrictions
    with pytest.raises(SparqlSyntaxError, match="shorthand"):
        sparql_update(
            kg,
            """DELETE WHERE { { ?x broader a . } UNION { ?x label ?l . } }""",
        )
    with pytest.raises(SparqlSyntaxError, match="shorthand"):
        sparql_update(
            kg,
            "DELETE WHERE { ?x broader a . BIND(1 AS ?one) }",
        )


def test_update_sequences_and_prefixes(kg):
    q = """PREFIX ex: <http://x.org/>
    INSERT DATA { ex:f broader b . } ;
    DELETE WHERE { ?x label ?l . } ;
    """
    got = rows(sparql_update(kg, q))
    assert ("http://x.org/f", "broader", "b") in got
    assert not [t for t in got if t[1] == "label"]
    # second op sees the first op's result
    q2 = 'INSERT DATA { q broader a . } ; DELETE DATA { q broader a . }'
    assert rows(sparql_update(kg, q2)) == rows(kg)


def test_zero_or_one_and_nps_text(kg):
    # zero-or-one hop
    got = sparql(kg, "SELECT ?o WHERE { c broader? ?o . }")
    assert sorted(r["o"] for r in got.collect()) == ["a", "c"]
    # one-token negated property set == the complement scan
    got2 = sparql(kg, "SELECT ?x ?o WHERE { ?x !broader ?o . }")
    want2 = sparql(kg, "SELECT ?x ?o WHERE { ?x label ?o . }")
    assert rows(got2) == rows(want2)
    # parenthesized members (spaces allowed), inverse member:
    # forward labels plus reversed labels
    got3 = sparql(kg, "SELECT ?x ?o WHERE { ?x !( broader | ^broader ) ?o . }")
    assert got3.count() == 8


def test_subselect_join_on_shared_var(kg):
    # each broader edge annotated with its parent's child-count; the
    # sub-SELECT exports only its projection (?y, ?n), so its internal
    # ?z never captures the outer scope
    got = sparql(
        kg,
        """SELECT ?x ?y ?n WHERE {
            ?x broader ?y .
            { SELECT ?y (COUNT(*) AS ?n) WHERE { ?z broader ?y . } GROUP BY ?y }
        } ORDER BY ?x""",
    ).collect()
    assert [(r["x"], r["y"], r["n"]) for r in got] == [
        ("b", "a", 3),
        ("c", "a", 3),
        ("c", "a", 3),
        ("d", "b", 2),
        ("http://x.org/e", "b", 2),
    ]


def test_subselect_scalar_extension(kg):
    # a sub-SELECT sharing no variable is the cartesian extension — the
    # scalar-aggregate idiom; also pins a group that STARTS with '{ SELECT'
    got = sparql(
        kg,
        """SELECT ?x ?m WHERE {
            { SELECT (COUNT(*) AS ?m) WHERE { ?z broader ?p . } }
            ?x label ?l .
            FILTER(LENGTH(?l) = 4)
        } ORDER BY ?x""",
    ).collect()
    assert [(r["x"], r["m"]) for r in got] == [("a", 5), ("b", 5), ("d", 5)]


def test_subselect_in_ask(kg):
    # the scalar-threshold idiom: does any parent have >= 3 children?
    q = """ASK { ?k broader ?y .
        { SELECT ?y (COUNT(*) AS ?n) WHERE { ?z broader ?y . } GROUP BY ?y }
        FILTER(?n >= %d) }"""
    assert sparql(kg, q % 3).first()["ask"] is True
    assert sparql(kg, q % 4).first()["ask"] is False


def test_postfix_values_clause(kg):
    got = sparql(
        kg,
        """SELECT ?x ?l WHERE { ?x label ?l . }
           ORDER BY ?x VALUES ?x { b d }""",
    ).collect()
    assert [(r["x"], r["l"]) for r in got] == [("b", "left"), ("d", "leaf")]
    with pytest.raises(SparqlSyntaxError, match="trailing VALUES"):
        sparql(
            kg,
            """SELECT ?x WHERE { ?x label ?l . VALUES ?x { b } }
               VALUES ?x { d }""",
        )


def test_bound_replace_substr_builtins(kg):
    # BOUND(?p): keep only solutions where the OPTIONAL matched
    got = sparql(
        kg,
        """SELECT ?x ?p WHERE {
            ?x label ?l . OPTIONAL { ?x broader ?p . }
            FILTER(BOUND(?p)) } ORDER BY ?x""",
    ).collect()
    assert [r["x"] for r in got] == ["b", "c", "c", "d"]
    # !BOUND(?p): the unmatched side
    got2 = sparql(
        kg,
        """SELECT ?x WHERE {
            ?x label ?l . OPTIONAL { ?x broader ?p . }
            FILTER(!BOUND(?p)) }""",
    ).collect()
    assert [r["x"] for r in got2] == ["a"]
    # SUBSTR maps to substring (both 1-based); replace passes through to
    # Spark's LITERAL replace untouched — the superset contract keeps
    # Spark SQL semantics (SPARQL's regex REPLACE = write regexp_replace)
    got3 = sparql(
        kg,
        """SELECT (REPLACE(?l, "oo", "0") AS ?r) (SUBSTR(?l, 1, 2) AS ?h)
           WHERE { a label ?l . }""",
    ).first()
    assert (got3["r"], got3["h"]) == ("r0t", "ro")


def test_subselect_loud_errors(kg):
    with pytest.raises(SparqlSyntaxError, match="update WHERE"):
        sparql_update(
            kg,
            "DELETE WHERE { ?x broader a . "
            "{ SELECT ?x WHERE { ?x label ?l . } } }",
        )


def test_loud_errors(kg):
    for q, msg in [
        ("SELECT WHERE { ?x broader a . }", "projection"),
        ("DELETE WHERE { ?x broader a . }", "unsupported query form"),
        ("SELECT ?x WHERE { { ?x broader a . } }", "UNION branch"),
        ("SELECT ?x WHERE { ?x broader a , . }", "object list"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            sparql(kg, q)


def test_update_loud_errors(kg):
    for q, msg in [
        ("INSERT DATA { ?x broader a . }", "variables"),
        ("DELETE DATA { GRAPH g1 { a b c . } }", "GRAPH in DELETE DATA"),
        ("CLEAR GRAPH g1", "quad table"),
        ("LOAD <http://x.org/d.nt>", "unsupported update form"),
        ("INSERT DATA { a b c . } DELETE DATA { a b c . }", "expected ';'"),
        ("DELETE { ?x broader+ ?y . } WHERE { ?x broader ?y . }", "property path"),
        ("", "empty update"),
    ]:
        with pytest.raises(ValueError, match=msg):
            sparql_update(kg, q)


def test_group_bodies_must_be_plain(kg):
    # features that only .patterns-consuming callers would silently drop
    for q, msg in [
        ("""SELECT ?x WHERE {
            { ?x broader a . FILTER NOT EXISTS { ?x label ?l . } }
            UNION { ?x label ?z . } }""", "plain triple groups"),
        ("""SELECT ?x WHERE {
            { ?x broader a . VALUES ?x { b } } UNION { ?x label ?z . } }""",
         "plain triple groups"),
        ("SELECT ?x WHERE { ?x label ?l . OPTIONAL { ?x broader ?p . "
         "VALUES ?p { a } } }", "OPTIONAL bodies"),
        ("SELECT ?x WHERE { ?x label ?l . MINUS { ?x broader ?p . "
         "BIND(1 AS ?one) } }", "MINUS bodies"),
        ("SELECT ?x WHERE { ?x label ?l . FILTER NOT EXISTS { "
         "?x broader ?p . OPTIONAL { ?p label ?q . } } }",
         "NOT EXISTS bodies"),
        ("SELECT ?x WHERE { ?x label ?l . FILTER EXISTS { "
         "?x broader ?p . FILTER(?p = \"a\") } }", "EXISTS bodies"),
        ("""SELECT ?x WHERE {
            { ?x broader a . FILTER EXISTS { ?x label ?l . } }
            UNION { ?x label ?z . } }""", "plain triple groups"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            sparql(kg, q)


def test_empty_update_templates_are_noops(kg):
    # explicit 'DELETE { } WHERE' is a legal no-op, NOT the DELETE WHERE
    # shorthand — nothing may be deleted
    got = sparql_update(kg, "DELETE { } WHERE { ?x broader ?y . }")
    assert rows(got) == rows(kg)
    got2 = sparql_update(kg, "DELETE { } INSERT { } WHERE { ?x broader ?y . }")
    assert rows(got2) == rows(kg)
    # empty delete beside a non-empty insert still inserts
    got3 = sparql_update(
        kg, "DELETE { } INSERT { ?y kid ?x . } WHERE { ?x broader ?y . }"
    )
    assert ("a", "kid", "b") in rows(got3)
    assert ("b", "broader", "a") in rows(got3)


def test_construct_template_rejects_paths(kg):
    with pytest.raises(SparqlSyntaxError, match="CONSTRUCT template"):
        sparql(kg, "CONSTRUCT { ?x broader+ ?y . } WHERE { ?x broader ?y . }")


def test_update_data_rejects_blank_nodes(kg):
    with pytest.raises(ValueError, match="blank node"):
        sparql_update(kg, "DELETE DATA { _:b broader a . }")
    with pytest.raises(ValueError, match="blank node"):
        sparql_update(kg, "INSERT DATA { x broader _:b . }")


def test_aggregates_over_expressions(kg):
    got = sparql(
        kg,
        """SELECT (SUM(STRLEN(?l)) AS ?chars)
                  (COUNT(DISTINCT STRLEN(?l)) AS ?nlens)
           WHERE { ?x label ?l . }""",
    ).first()
    # label lengths 4,4,5,4
    assert (got["chars"], got["nlens"]) == (17, 2)
    got2 = sparql(
        kg,
        """SELECT ?y (MAX(STRLEN(?x)) AS ?longest)
           WHERE { ?x broader ?y . } GROUP BY ?y ORDER BY ?y""",
    ).collect()
    assert [(r["y"], r["longest"]) for r in got2] == [("a", 1), ("b", 14)]


def test_with_graph_scoped_update(spark):
    quads = spark.createDataFrame(
        [
            ("g1", "b", "broader", "a"),
            ("g2", "b", "broader", "a"),
            ("g1", "a", "label", "root"),
        ],
        "graph string, subject string, predicate string, object string",
    )
    out = sparql_update(
        quads,
        """WITH g1 DELETE { ?x broader ?y . }
           INSERT { ?y narrower ?x . } WHERE { ?x broader ?y . }""",
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        ("g1", "a", "label", "root"),
        ("g1", "a", "narrower", "b"),
        ("g2", "b", "broader", "a"),
    ]
    # DELETE WHERE shorthand under WITH
    out2 = sparql_update(quads, "WITH g1 DELETE WHERE { ?x broader ?y . }")
    assert sorted(tuple(r) for r in out2.collect()) == [
        ("g1", "a", "label", "root"),
        ("g2", "b", "broader", "a"),
    ]
    for q, msg, table in [
        ("WITH g1 INSERT DATA { a b c . }", "INSERT DATA", quads),
        ("WITH g1 DELETE WHERE { ?x broader ?y . }", "quad table",
         quads.drop("graph")),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            sparql_update(table, q)


def test_graph_management_forms(spark):
    quads = spark.createDataFrame(
        [
            ("g1", "b", "broader", "a"),
            ("g2", "c", "broader", "a"),
            ("g2", "b", "broader", "a"),
            (None, "x", "label", "loose"),
        ],
        "graph string, subject string, predicate string, object string",
    )

    def graphs(df):
        return sorted(
            ((r["graph"], r["subject"]) for r in df.collect()), key=str
        )

    got = sparql_update(quads, "CLEAR GRAPH g1")
    assert graphs(got) == [("g2", "b"), ("g2", "c"), (None, "x")]
    assert graphs(sparql_update(quads, "DROP SILENT DEFAULT")) == [
        ("g1", "b"), ("g2", "b"), ("g2", "c"),
    ]
    assert graphs(sparql_update(quads, "CLEAR NAMED")) == [(None, "x")]
    assert sparql_update(quads, "CLEAR ALL").count() == 0
    # CREATE is the no-op of implicit graphs
    assert graphs(sparql_update(quads, "CREATE GRAPH g9")) == graphs(quads)
    # ADD: set semantics — (b broader a) already in g2 lands once
    added = sparql_update(quads, "ADD GRAPH g1 TO GRAPH g2")
    assert graphs(added) == [
        ("g1", "b"), ("g2", "b"), ("g2", "c"), (None, "x"),
    ]
    # COPY replaces the target; MOVE also drops the source
    copied = sparql_update(quads, "COPY g1 TO g2")
    assert graphs(copied) == [("g1", "b"), ("g2", "b"), (None, "x")]
    moved = sparql_update(quads, "MOVE g1 TO DEFAULT")
    assert graphs(moved) == [("g2", "b"), ("g2", "c"), (None, "b")]
    # copy onto itself is the identity
    assert graphs(sparql_update(quads, "COPY g1 TO g1")) == graphs(quads)
    # op sequence mixing management and WHERE forms
    seq = sparql_update(
        quads, "ADD g1 TO g2 ; WITH g2 DELETE WHERE { ?x broader a . }"
    )
    assert graphs(seq) == [("g1", "b"), (None, "x")]


def test_trailing_values_joins_after_grouping(kg):
    # spec 18.2.4.3: the final VALUES joins the GROUPED solutions — a
    # VALUES on a non-grouped variable is the cartesian extension and
    # must NOT filter rows before counting
    got = sparql(
        kg,
        """SELECT ?y (COUNT(*) AS ?n) WHERE { ?x broader ?y . }
           GROUP BY ?y ORDER BY ?y VALUES ?x { b }""",
    ).collect()
    assert [(r["y"], r["n"]) for r in got] == [("a", 3), ("b", 2)]
    # a VALUES on the grouped variable restricts the groups
    got2 = sparql(
        kg,
        """SELECT ?y (COUNT(*) AS ?n) WHERE { ?x broader ?y . }
           GROUP BY ?y VALUES ?y { a }""",
    ).collect()
    assert [(r["y"], r["n"]) for r in got2] == [("a", 3)]


def test_ask_trailing_values_and_exhaustion(kg):
    q = "ASK { ?x broader ?y . } VALUES ?x { %s }"
    assert sparql(kg, q % "nosuch").first()["ask"] is False
    assert sparql(kg, q % "d").first()["ask"] is True
    for bad, msg in [
        ("ASK { ?x broader ?y . } LIMIT 1", "unexpected token"),
        ("SELECT ?x WHERE { ?x label ?l . } VALUES ?x { b } VALUES ?x { d }",
         "multiple trailing"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            sparql(kg, bad)


def test_sparql_text_stats_threading(spark):
    """stats passed to the text front-end reaches every BGP: the rare
    pattern seeds the join even when the huge one is written first, and
    results are unchanged; the contextvar resets after the call."""
    from ontology_mapping_spark.operators.kgquery import predicate_stats
    from ontology_mapping_spark.operators.sparql_text import (
        _QUERY_STATS,
        sparql,
        sparql_update,
    )

    rows = [(f"s{i}", "type", f"c{i % 3}") for i in range(300)]
    rows += [(f"s{i}", "rare", f"o{i}") for i in range(3)]
    kg = spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )
    stats = predicate_stats(kg)
    q = "SELECT ?s ?c ?o WHERE { ?s <type> ?c . ?s <rare> ?o }"
    legacy = sparql(kg, q)
    tuned = sparql(kg, q, stats=stats)
    key = lambda r: (r["s"], r["c"], r["o"])  # noqa: E731
    assert sorted(map(key, tuned.collect())) == sorted(map(key, legacy.collect()))
    tuned_plan = tuned._jdf.queryExecution().optimizedPlan().toString()
    assert tuned_plan.index("rare") < tuned_plan.index("type")
    assert _QUERY_STATS.get() is None  # reset after plan construction
    # UPDATE WHERE groups order by stats too, same results
    u = "DELETE { ?s <type> ?c } WHERE { ?s <type> ?c . ?s <rare> ?o }"
    a = sorted(map(tuple, sparql_update(kg, u).collect()))
    b = sorted(map(tuple, sparql_update(kg, u, stats=stats).collect()))
    assert a == b and len(a) == 300 + 3 - 3


def test_values_undef_wildcard_text(kg):
    """A real UNDEF row: the wildcard binding extends every solution
    (the earlier 'undef' test never actually used UNDEF)."""
    got = sparql(
        kg,
        """SELECT ?x ?tag WHERE {
            ?x label ?l . VALUES ( ?x ?tag ) { ( UNDEF "W" ) ( b "B" ) }
        } ORDER BY ?x ?tag""",
    ).collect()
    rows_ = [(r["x"], r["tag"]) for r in got]
    assert rows_.count(("b", "W")) == 1 and rows_.count(("b", "B")) == 1
    assert ("a", "W") in rows_ and ("c", "W") in rows_ and ("d", "W") in rows_


def test_filter_string_literals_not_rewritten(kg):
    """Rewrites (?var strip, &&/||, builtin renames) must not touch the
    INSIDE of quoted literals: "a?b" must stay "a?b"."""
    # label 'left' does NOT contain 'le?ft' — a naive ?var strip would
    # turn the literal into 'left' and wrongly match
    got = sparql(
        kg,
        'SELECT ?x WHERE { ?x label ?l . FILTER(CONTAINS(?l, "le?ft")) }',
    ).collect()
    assert got == []
    got2 = sparql(
        kg,
        'SELECT ?x WHERE { ?x label ?l . FILTER(?l = "x&&y" || ?l = "left") }',
    ).collect()
    assert [r["x"] for r in got2] == ["b"]
    # function-name-looking text inside a literal survives
    got3 = sparql(
        kg,
        'SELECT ?x WHERE { ?x label ?l . FILTER(?l != "strlen(z)") }',
    ).count()
    assert got3 == 4


def test_lang_and_datatype_literals_raise(kg):
    import pytest

    from ontology_mapping_spark.operators.sparql_text import SparqlSyntaxError

    with pytest.raises(SparqlSyntaxError, match="language-tagged"):
        sparql(kg, 'SELECT ?s WHERE { ?s label "x"@en . }')
    with pytest.raises(SparqlSyntaxError, match="language-tagged"):
        sparql(kg, 'SELECT ?s WHERE { ?s label "5"^^xsd:int . }')


def test_a_shorthand_is_rdf_type(spark):
    """Bare 'a' in verb position is SPARQL grammar for rdf:type, not a
    predicate named 'a'."""
    kg2 = spark.createDataFrame(
        [
            ("x", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "C"),
            ("y", "a", "D"),  # a literal predicate named 'a' is data
        ],
        "subject string, predicate string, object string",
    )
    got = sparql(kg2, "SELECT ?s WHERE { ?s a C . }").collect()
    assert [r["s"] for r in got] == ["x"]
    # the literal predicate is still reachable by quoting nothing special
    got2 = sparql(kg2, 'SELECT ?s WHERE { ?s "a" D . }').collect()
    assert [r["s"] for r in got2] == ["y"]


def test_subquery_union_raises(kg):
    import pytest

    from ontology_mapping_spark.operators.sparql_text import SparqlSyntaxError

    with pytest.raises(SparqlSyntaxError, match="UNION over a"):
        sparql(
            kg,
            """SELECT ?x WHERE {
                { SELECT ?x WHERE { ?x broader ?y } } UNION { ?x label ?l }
            }""",
        )
