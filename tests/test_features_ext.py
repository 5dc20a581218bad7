"""Extended feature operators (thesis/pre_processing_data.py:216-341) vs
networkx/pure-Python oracle on the fixture ontology."""

import math

import networkx as nx
import pytest
from pyspark.sql import functions as F

from ontology_mapping_spark.functions.vectors import cosine_py, make_embed_udf
from ontology_mapping_spark.operators import features_ext as FX
from ontology_mapping_spark.operators import graph as G
from ontology_mapping_spark.operators.labels import (
    extract_hierarchy,
    extract_labels,
    label_text,
)
from tests import oracle


@pytest.fixture(scope="module")
def setup(spark, fx, fx_dfs):
    edges_df = extract_hierarchy(fx_dfs["triples"]).cache()
    closure_df = G.transitive_closure(edges_df).cache()
    depths_df = G.depths(edges_df, closure_df).cache()
    lt = label_text(extract_labels(fx_dfs["triples"])).cache()
    emb_df = lt.select("uri", make_embed_udf(32)(F.col("text")).alias("vec")).cache()
    # same-side pairs so hierarchy features are non-trivial
    pairs = spark.createDataFrame(
        [(f"src:C{i:04d}", f"src:C{j:04d}") for i in range(0, 40) for j in (i + 1, i + 3) if j < 45],
        "src string, tgt string",
    ).cache()
    edges = oracle.extract_edges(fx.triples)
    g = oracle.build_graph(edges)
    return edges_df, closure_df, depths_df, emb_df, pairs, g, edges


def _pairs_list(pairs):
    return [(r["src"], r["tgt"]) for r in pairs.collect()]


def test_sibling_and_shared_child_flags(spark, setup):
    edges_df, _, _, _, pairs, g, _ = setup
    got = {
        (r["src"], r["tgt"]): r["sibling_score"]
        for r in FX.sibling_score(pairs, edges_df).collect()
    }
    got_c = {
        (r["src"], r["tgt"]): r["shared_child"]
        for r in FX.shared_child_flag(pairs, edges_df).collect()
    }
    for a, b in _pairs_list(pairs):
        pa = set(g.predecessors(a)) if a in g else set()
        pb = set(g.predecessors(b)) if b in g else set()
        assert got[(a, b)] == (1 if pa & pb else 0), (a, b)
        ca = set(g.successors(a)) if a in g else set()
        cb = set(g.successors(b)) if b in g else set()
        assert got_c[(a, b)] == (1 if ca & cb else 0), (a, b)


def test_lca_depth_and_overlap_ratio(spark, setup):
    _, closure_df, depths_df, _, pairs, g, _ = setup
    depth = oracle.depths_longest_path(g)
    got_l = {
        (r["src"], r["tgt"]): r["lca_depth"]
        for r in FX.lca_depth(pairs, closure_df, depths_df).collect()
    }
    got_o = {
        (r["src"], r["tgt"]): r["hierarchical_overlap_ratio"]
        for r in FX.overlap_ratio(pairs, closure_df, depths_df).collect()
    }
    for a, b in _pairs_list(pairs):
        anc_a, anc_b = oracle.ancestors(g, a), oracle.ancestors(g, b)
        common = anc_a & anc_b
        want_l = max((depth[x] for x in common), default=0)
        assert got_l[(a, b)] == want_l, (a, b)
        maxd = max(depth.get(a, 0), depth.get(b, 0))
        want_o = len(common) / maxd if maxd > 0 else 0.0
        assert math.isclose(got_o[(a, b)], want_o, abs_tol=1e-12), (a, b)


def test_parent_similarity(spark, setup):
    edges_df, _, _, emb_df, pairs, g, _ = setup
    emb = {r["uri"]: list(r["vec"]) for r in emb_df.collect()}
    got = {
        (r["src"], r["tgt"]): r["parent_similarity"]
        for r in FX.parent_similarity(pairs, edges_df, emb_df).collect()
    }
    for a, b in _pairs_list(pairs):
        pa = list(g.predecessors(a)) if a in g else []
        pb = list(g.predecessors(b)) if b in g else []
        if not pa or not pb:
            want = 0.0
        else:
            want = max(
                cosine_py(emb.get(x), emb.get(y)) for x in pa for y in pb
            )
        assert math.isclose(got[(a, b)], want, rel_tol=1e-5, abs_tol=1e-5), (a, b)


def test_cross_reference_flag(spark, fx, fx_dfs, setup):
    _, _, _, _, pairs, _, _ = setup
    em_df = fx_dfs["triples"].filter(F.col("predicate") == "skos:exactMatch").select(
        "subject", "object"
    )
    got = {
        (r["src"], r["tgt"]): r["cross_reference_match"]
        for r in FX.cross_reference_flag(pairs, em_df).collect()
    }
    em = {}
    for s, o in oracle.exact_match_edges(fx.triples):
        em.setdefault(s, set()).add(o)
    for a, b in _pairs_list(pairs):
        want = 1 if em.get(a, set()) & em.get(b, set()) else 0
        assert got[(a, b)] == want, (a, b)


def test_hierarchical_distance(spark, setup):
    edges_df, _, _, _, pairs, g, _ = setup
    got = {
        (r["src"], r["tgt"]): r["hierarchical_distance"]
        for r in FX.hierarchical_distance(pairs, edges_df, max_hops=10).collect()
    }
    for a, b in _pairs_list(pairs):
        try:
            want = nx.shortest_path_length(g, a, b)
        except (nx.NetworkXNoPath, nx.NodeNotFound):
            want = None  # reference: np.inf
        assert got[(a, b)] == want, (a, b)


def test_hierarchical_distance_identity_pair_is_zero(spark):
    """src == tgt is distance 0 (the reference's shortest_path_length
    (v, v)), not NULL/unreachable — BFS never emits the zero-length
    path, so the operator patches it in after the join."""
    from ontology_mapping_spark.operators.features_ext import (
        hierarchical_distance,
    )

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b")], "child string, parent string"
    )
    pairs = spark.createDataFrame(
        [("a", "c"), ("b", "b"), ("a", "zzz")], "src string, tgt string"
    )
    got = {
        (r["src"], r["tgt"]): r["hierarchical_distance"]
        for r in hierarchical_distance(pairs, edges).collect()
    }
    assert got[("a", "c")] == 2
    assert got[("b", "b")] == 0          # identity: 0, not unreachable
    assert got[("a", "zzz")] is None     # truly unreachable stays NULL
