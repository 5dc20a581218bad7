"""Graph operators vs networkx oracle: closure, depths, siblings, CC, BFS."""

from pyspark.sql import functions as F

from ontology_mapping_spark.operators import graph as G
from ontology_mapping_spark.operators.labels import extract_hierarchy
from tests import oracle


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "child string, parent string")


def test_transitive_closure_small(spark):
    #      r
    #     / \
    #    a   b
    #    |  / |
    #    c-+  d   (c has parents a and b -> DAG)
    edges = [("a", "r"), ("b", "r"), ("c", "a"), ("c", "b"), ("d", "b")]
    df = _edges_df(spark, edges)
    got = {
        (r["node"], r["ancestor"]): r["dist"]
        for r in G.transitive_closure(df).collect()
    }
    g = oracle.build_graph(edges)
    want = oracle.closure_with_dist(g)
    assert got == want


def test_closure_and_depths_on_fixture(spark, fx, fx_dfs):
    edges_df = extract_hierarchy(fx_dfs["triples"])
    edges = oracle.extract_edges(fx.triples)
    assert sorted((r["child"], r["parent"]) for r in edges_df.collect()) == edges

    closure_df = G.transitive_closure(edges_df)
    got = {(r["node"], r["ancestor"]): r["dist"] for r in closure_df.collect()}
    g = oracle.build_graph(edges)
    want = oracle.closure_with_dist(g)
    assert got == want

    got_d = {r["node"]: r["depth"] for r in G.depths(edges_df, closure_df).collect()}
    want_d = oracle.depths_longest_path(g)
    assert got_d == want_d


def test_siblings_on_fixture(spark, fx, fx_dfs):
    edges_df = extract_hierarchy(fx_dfs["triples"])
    edges = oracle.extract_edges(fx.triples)
    g = oracle.build_graph(edges)
    got = {(r["a"], r["b"]) for r in G.siblings(edges_df).collect()}
    want = set()
    for n in g.nodes:
        for s in oracle.siblings(g, n):
            want.add((n, s))
    assert got == want


def test_connected_components_chain_and_forest(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "s")]
    df = spark.createDataFrame(edges, "u string, v string")
    got = {r["node"]: r["component"] for r in G.connected_components(df).collect()}
    want = oracle.connected_components_exact(edges)
    assert got == want


def test_connected_components_exactmatch_fixture(spark, fx, fx_dfs):
    em = fx_dfs["triples"].filter(F.col("predicate") == "skos:exactMatch")
    df = em.select(F.col("subject").alias("u"), F.col("object").alias("v"))
    got = {r["node"]: r["component"] for r in G.connected_components(df).collect()}
    want = oracle.connected_components_exact(oracle.exact_match_edges(fx.triples))
    assert got == want


def test_connected_components_isolated_vertices(spark):
    edges = spark.createDataFrame([("a", "b")], "u string, v string")
    verts = spark.createDataFrame([("a",), ("b",), ("z",)], "node string")
    got = {
        r["node"]: r["component"]
        for r in G.connected_components(edges, vertices=verts).collect()
    }
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_bounded_bfs(spark):
    edges = [("c", "a"), ("a", "r"), ("d", "c")]
    df = _edges_df(spark, edges)
    got = {(r["src"], r["dst"]): r["dist"] for r in G.bounded_bfs(df, 6).collect()}
    assert got[("d", "r")] == 3
    assert got[("c", "r")] == 2
    assert got[("c", "a")] == 1
    assert ("r", "d") not in got


def test_bounded_bfs_from_seeded_scales_with_sources(spark):
    """Seeded BFS == whole-graph BFS restricted to the seeds, and its
    output never contains rows for unseeded nodes — the work bound is
    |sources| * reach, not |V| (VERDICT r3 #5). The big detached chain
    must contribute zero rows."""
    chain = [(f"n{i}", f"n{i+1}") for i in range(50)]  # detached component
    edges = [("c", "a"), ("a", "r"), ("d", "c"), ("e", "a")] + chain
    df = _edges_df(spark, edges)
    seeds = spark.createDataFrame([("d",), ("e",), ("ghost",)], "src string")

    got = {
        (r["src"], r["dst"]): r["dist"]
        for r in G.bounded_bfs_from(df, seeds, 6).collect()
    }
    assert {s for s, _ in got} == {"d", "e"}  # ghost unreachable, chain untouched
    assert got == {
        ("d", "c"): 1,
        ("d", "a"): 2,
        ("d", "r"): 3,
        ("e", "a"): 1,
        ("e", "r"): 2,
    }
    # parity with the whole-graph walk, restricted to the seeds
    full = {
        (r["src"], r["dst"]): r["dist"]
        for r in G.bounded_bfs(df, 6).collect()
        if r["src"] in {"d", "e", "ghost"}
    }
    assert got == full
    # hop cap respected from the seeded frontier
    capped = {
        (r["src"], r["dst"]): r["dist"]
        for r in G.bounded_bfs_from(df, seeds, 2).collect()
    }
    assert capped == {k: v for k, v in got.items() if v <= 2}


# --------------------------------------------------------------------------
# incremental connected components (crawl-cadence CC maintenance)
# --------------------------------------------------------------------------

def _cc_dict(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_incremental_merges_components(spark):
    assign = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d")],
        "node string, component string",
    )
    delta = spark.createDataFrame([("b", "c")], "u string, v string")
    got = _cc_dict(G.incremental_components(assign, delta))
    # a,b,c merge under min id 'a'; d untouched
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d"}


def test_incremental_new_nodes(spark):
    assign = spark.createDataFrame([("c", "c")], "node string, component string")
    delta = spark.createDataFrame(
        [("x", "y"), ("z", "c")], "u string, v string"
    )
    got = _cc_dict(G.incremental_components(assign, delta))
    assert got == {"c": "c", "z": "c", "x": "x", "y": "x"}


def test_incremental_intra_component_edge_is_noop(spark):
    assign = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("q", "q")], "node string, component string"
    )
    delta = spark.createDataFrame([("a", "b")], "u string, v string")
    got = _cc_dict(G.incremental_components(assign, delta))
    assert got == {"a": "a", "b": "a", "q": "q"}


def test_incremental_equals_full_recompute(spark):
    # the factoring claim: incremental over (E0 -> assign, then E1) must
    # equal one CC over E0 ∪ E1, on a seeded random graph
    import random

    rng = random.Random(20240818)
    nodes = [f"n{i:02d}" for i in range(40)]
    e0 = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(35)]
    e1 = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(15)]
    df0 = spark.createDataFrame(e0, "u string, v string")
    df1 = spark.createDataFrame(e1, "u string, v string")
    assign = G.connected_components(df0)
    inc = _cc_dict(G.incremental_components(assign, df1))
    full = _cc_dict(G.connected_components(df0.unionByName(df1)))
    assert inc == full
