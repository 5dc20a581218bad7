"""Distributed graph operators over the (child, parent) edge DataFrame.

The reference does per-call ``networkx`` traversals (nx.ancestors,
nx.topological_sort, G.predecessors/successors — thesis/
process_data_features.py:112-143, generate_candidates.py:88-141). At 10^12
rows, per-row traversal is impossible; the engine materializes *once*:

* :func:`transitive_closure` — ancestor table (node, ancestor, dist) via
  **path-doubling iterative self-joins** (O(log diameter) rounds, each a
  shuffle join + max-aggregate), lineage cut with localCheckpoint per round.
  This is the north rule's "precomputed transitive-closure ancestor table
  materialized once via iterative self-joins".
* :func:`depths` — longest-path depth per node derived from the closure
  (max dist over ancestors). ⚠ The reference's topological depth overwrites
  a multi-parent child once per parent — *last parent in iteration order
  wins*, which is order-dependent (thesis/process_data_features.py:116-120).
  The engine canonicalizes to max-over-parents (longest path), which
  coincides exactly on tree-shaped slices (FIXTURES.md §2).
* :func:`siblings` — 2-hop self-join (predecessors -> successors,
  thesis/generate_candidates.py:137-139).
* :func:`connected_components` — alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond") for
  mention canonicalization; generalizes the reference's 1-hop exactMatch
  overlap check (thesis/pre_processing_data.py:337-341) to transitive
  clusters.
* :func:`bounded_bfs` — depth-limited shortest path (reference:
  nx.shortest_path_length with ∞ sentinel, thesis/pre_processing_data.py:216-223).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cut(df: DataFrame) -> DataFrame:
    """Truncate lineage between fixpoint iterations (Spark re-plans the
    whole iteration chain otherwise). session.materialize: executor-local
    blocks by default — no external checkpoint dir needed — with the
    conf-switchable reliable-checkpoint mode for clusters where executor
    loss mid-fixpoint must not fail the job."""
    from ontology_mapping_spark.session import materialize

    return materialize(df)


def transitive_closure(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """(child, parent) -> (node, ancestor, dist) with dist = longest path.

    Path doubling: after round k the table holds every ancestor reachable
    within <= 2^k hops, so rounds = ceil(log2(diameter)) — a DAG 2^20 deep
    would need 20 shuffle rounds, vs 10^6 for naive one-hop expansion.
    """
    anc = _cut(
        edges.select(
            F.col("child").alias("node"),
            F.col("parent").alias("ancestor"),
            F.lit(1).alias("dist"),
        ).distinct()
    )
    # after round i the table covers every path of <= 2^i edges (budget);
    # if the observed max dist is STRICTLY below the budget, no path used
    # the full doubling range, so the longest path is already complete —
    # stop without the extra confirmation round a fixpoint-compare needs.
    budget = 1
    for _ in range(max_iters):
        hop = (
            anc.alias("a")
            .join(anc.alias("b"), F.col("a.ancestor") == F.col("b.node"))
            .select(
                F.col("a.node").alias("node"),
                F.col("b.ancestor").alias("ancestor"),
                (F.col("a.dist") + F.col("b.dist")).alias("dist"),
            )
        )
        merged = (
            anc.unionByName(hop)
            .groupBy("node", "ancestor")
            .agg(F.max("dist").alias("dist"))
        )
        merged = _cut(merged)
        budget *= 2
        md = merged.agg(F.coalesce(F.max("dist"), F.lit(0)).alias("m")).first()["m"]
        anc = merged
        if md < budget:
            break
        # md == budget: a path used the whole range — longer ones may exist
        # (cycles never satisfy md < budget; max_iters bounds them)
    return anc


def node_universe(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("child").alias("node"))
        .unionByName(edges.select(F.col("parent").alias("node")))
        .distinct()
    )


def depths(edges: DataFrame, closure: DataFrame | None = None) -> DataFrame:
    """(node, depth): longest path from a root; roots get 0.

    depth(n) = max over ancestors of dist(n, ancestor) — the longest upward
    path necessarily ends at a root. Canonical max-parent semantics (see
    module docstring for the divergence from the reference's
    order-dependent definition).
    """
    closure = closure if closure is not None else transitive_closure(edges)
    per_node = closure.groupBy("node").agg(F.max("dist").alias("depth"))
    return (
        node_universe(edges)
        .join(per_node, "node", "left")
        .select("node", F.coalesce(F.col("depth"), F.lit(0)).alias("depth"))
    )


def siblings(edges: DataFrame) -> DataFrame:
    """(a, b) distinct pairs sharing >=1 parent, a != b (both directions).

    Reference: parents = G.predecessors(tgt); siblings = union of
    G.successors(parent) minus tgt (thesis/generate_candidates.py:137-140).
    """
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    return (
        e1.join(e2, F.col("e1.parent") == F.col("e2.parent"))
        .filter(F.col("e1.child") != F.col("e2.child"))
        .select(F.col("e1.child").alias("a"), F.col("e2.child").alias("b"))
        .distinct()
    )


def symmetrize(edges: DataFrame, a: str = "child", b: str = "parent") -> DataFrame:
    """Undirected view: both orientations, self-loops dropped.
    (Reference adds exactMatch in both directions explicitly,
    thesis/pre_processing_data.py:124-125.)"""
    fwd = edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
    return (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges large->small; connect all smaller neighbors (and u) to
    the minimum of the neighborhood."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    out1 = (
        oriented.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    out2 = m.select(F.col("u"), F.col("m").alias("v"))
    return (
        out1.unionByName(out2).filter(F.col("u") != F.col("v")).distinct()
    )


def connected_components(
    edges: DataFrame, vertices: DataFrame | None = None, max_iters: int = 50
) -> DataFrame:
    """Undirected connected components -> (node, component) with component =
    min node id in the component. Alternating large-star/small-star; each
    round is two shuffle joins; converges in O(log n) rounds.

    One materialization per round is deliberate: each star references its
    input 2-3 times (sym union, join + union-back), so chaining rounds
    without a lineage cut duplicates the previous round's whole plan into
    every reference — measured 1.7x SLOWER with two rounds per cut, the
    opposite of the intended per-job-overhead amortization.

    ``edges`` uses columns (u, v) — pass any edge list through
    :func:`symmetrize` or rename first. ``vertices`` (optional, column
    ``node``) adds isolated nodes as singleton components.
    """
    def _sig(df: DataFrame):
        # order-independent edge-set signature: one aggregate job instead
        # of the two exceptAll shuffle-joins a set-compare would cost
        # (bit_xor: commutative and overflow-free under ANSI mode)
        return df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()

    e = _cut(
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v")).distinct()
    )
    sig = _sig(e)
    prev = e
    for _ in range(max_iters):
        new_e = _cut(_small_star(_large_star(e)))
        new_sig = _sig(new_e)
        prev, e = e, new_e
        if (new_sig["n"], new_sig["h"]) == (sig["n"], sig["h"]):
            # signature match is necessary but (2^-64) not sufficient —
            # confirm with one exact set-compare before stopping, so a
            # hash collision degrades to an extra round, never to silently
            # under-merged components
            if new_e.exceptAll(prev).isEmpty():
                break
        sig = new_sig
    # after convergence e is a star: (member, root)
    comp = (
        e.select(F.greatest("u", "v").alias("node"), F.least("u", "v").alias("component"))
        .unionByName(
            e.select(F.least("u", "v").alias("node"), F.least("u", "v").alias("component"))
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    if vertices is not None:
        comp = (
            vertices.select("node")
            .distinct()
            .join(comp, "node", "left")
            .select(
                "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
            )
        )
    return comp


def bounded_bfs(edges: DataFrame, max_hops: int = 6) -> DataFrame:
    """All-pairs directed shortest-path within ``max_hops``:
    (src, dst, dist). Unreachable pairs are absent (the reference returns
    np.inf, thesis/pre_processing_data.py:223 — callers coalesce)."""
    frontier = edges.select(
        F.col("child").alias("src"), F.col("parent").alias("dst"), F.lit(1).alias("dist")
    ).distinct()
    best = _cut(frontier)
    for _ in range(max_hops - 1):
        step = (
            best.alias("a")
            .join(
                edges.select(
                    F.col("child").alias("dst"), F.col("parent").alias("nxt")
                ).alias("b"),
                "dst",
            )
            .select(
                F.col("src"), F.col("nxt").alias("dst"), (F.col("dist") + 1).alias("dist")
            )
        )
        merged = (
            best.unionByName(step).groupBy("src", "dst").agg(F.min("dist").alias("dist"))
        )
        merged = _cut(merged)
        if merged.count() == best.count():
            best = merged
            break
        best = merged
    return best


def bounded_bfs_from(
    edges: DataFrame, sources: DataFrame, max_hops: int = 6
) -> DataFrame:
    """Directed shortest-path (child -> parent) within ``max_hops``, for
    walks that START at ``sources`` (a one-column DataFrame named ``src``):
    (src, dst, dist), src always from ``sources``. Unreachable pairs are
    absent.

    Scale shape: proper frontier BFS — each round expands only the nodes
    discovered last round, so work is O(|sources| * reach^hops) and never
    touches the rest of the graph (bounded_bfs is O(|V| * reach^hops)).
    First discovery is the shortest distance (all frontier rows at round h
    carry dist h), so no min-merge over the accumulated set is needed —
    just a left-anti dedup against what's already known per (src, dst)."""
    up = edges.select(
        F.col("child").alias("dst"), F.col("parent").alias("nxt")
    ).distinct()
    frontier = _cut(
        sources.select(F.col("src").alias("dst"))
        .distinct()
        .join(up, "dst")
        .select(
            F.col("dst").alias("src"),
            F.col("nxt").alias("dst"),
            F.lit(1).alias("dist"),
        )
        .distinct()
    )
    best = frontier
    for hop in range(2, max_hops + 1):
        if frontier.isEmpty():
            break
        step = (
            frontier.join(up, "dst")
            .select("src", F.col("nxt").alias("dst"), F.lit(hop).alias("dist"))
            .distinct()
        )
        new = _cut(step.join(best, ["src", "dst"], "left_anti"))
        if new.isEmpty():
            break
        best = _cut(best.unionByName(new))
        frontier = new
    return best


def incremental_components(
    assign: DataFrame, delta_edges: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Fold a delta edge batch into an existing (node, component)
    assignment without recomputing components over the full edge set.

    The crawl-cadence form of :func:`connected_components`: at 10^12
    scale re-running CC over every edge ever seen per crawl is the
    canonicalization bottleneck, but with component = min member id (this
    module's convention) the update factors exactly:

    1. relabel the delta's endpoints through the old assignment (new
       nodes pass through as themselves) — the QUOTIENT edges;
    2. run CC on the quotient graph, whose size is O(|delta|), not
       O(|V| + |E|);
    3. map old assignments through the quotient result (one join), and
       assign delta-new nodes their quotient component.

    min(A ∪ B ∪ ...) == min(min A, min B, ...), so the result is
    IDENTICAL to ``connected_components(old_edges ∪ delta_edges)`` —
    pinned by a property test against the full recompute. Work scales
    with the delta and the components it touches; untouched components
    never shuffle (left-join pass-through).

    ``assign``: (node, component); ``delta_edges``: (u, v), direction
    ignored. A delta edge inside one existing component quotients to a
    self-loop and is dropped by CC's canonicalization.
    """
    a_u = assign.select(F.col("node").alias("u"), F.col("component").alias("cu"))
    a_v = assign.select(F.col("node").alias("v"), F.col("component").alias("cv"))
    quotient = (
        delta_edges.join(a_u, "u", "left")
        .join(a_v, "v", "left")
        .select(
            F.coalesce("cu", "u").alias("u"),
            F.coalesce("cv", "v").alias("v"),
        )
    )
    merged = connected_components(quotient, max_iters=max_iters)
    remap = merged.select(
        F.col("node").alias("component"),
        F.col("component").alias("__new"),
    )
    updated = assign.join(remap, "component", "left").select(
        "node", F.coalesce("__new", "component").alias("component")
    )
    new_nodes = (
        delta_edges.select(F.col("u").alias("node"))
        .unionByName(delta_edges.select(F.col("v").alias("node")))
        .distinct()
        .join(assign.select("node"), "node", "left_anti")
    )
    new_rows = new_nodes.join(merged, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )
    return updated.unionByName(new_rows)
