"""Web link-graph construction over Common-Crawl-style pages.

The north rule's final stage is *graph materialize* over a 10^12-page web
corpus. Besides the ontology graph (operators/graph.py), the other graph a
KG-construction pipeline materializes from raw pages is the **hyperlink
graph**: anchors are both edges (host-level link graph, PageRank authority
for triple-confidence weighting) and KG signals in their own right
(anchor-text alias mining is the classic source of entity surface forms —
the reference's label/synonym table, thesis/pre_processing_data.py:86-101,
plays the same role for ontologies).

Everything here is pure Catalyst — regexp extraction, string algebra,
joins and aggregates; no Python executes per row. Each operator has a
DuckDB oracle twin in queries.py (identical regex constants) and a
pure-Python twin in tests/test_linkgraph.py, so the three derivations
cross-check.

Scale notes (100 TB):
* ``extract_links`` is a projection + generator (explode) — no shuffle;
  the anchor regex runs inside whole-stage codegen on the decoded page
  bytes already in memory from the scan.
* ``link_graph`` / ``degrees`` are partial+final hash aggregates keyed on
  host — the classic map-side-combine shape (billions of links collapse
  to millions of host pairs before the exchange).
* ``pagerank`` is the textbook iterative DataFrame job: per iteration one
  shuffle join (ranks ⋈ edges on src) + one partial+final aggregate on
  dst, lineage cut per round via session.materialize. Hot dst hosts
  (everyone links to wikipedia.org) are exactly the skew the aggregate's
  map-side combine absorbs — the per-partition partial sums bound any
  reducer's input by the partition count, not the in-degree.

URL-resolution contract (documented subset of RFC 3986): fragments are
stripped; ``javascript:``/``mailto:``/other non-http(s) schemes drop;
protocol-relative ``//h/p`` inherits the base scheme; root-relative
``/p`` joins the base origin; other hrefs join the base *directory*
(no ``..`` dot-segment squashing — synthetic corpora here do not need
it and the oracle twin must stay expressible in both SQL dialects).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One regex vocabulary, shared verbatim by the Spark engine, the DuckDB
# oracles (queries.py imports these constants) and the pytest twins.
# Both Java regex and RE2 accept the (?is)/(?i) inline flags and lazy
# quantifiers used here.
ANCHOR_RE = r"""(?is)<a\s[^>]*?href\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a>"""
SCHEME_RE = r"(?i)^([a-z][a-z0-9+.\-]*):"
ORIGIN_RE = r"(?i)^([a-z][a-z0-9+.\-]*://[^/?#]*)"
HOST_RE = r"(?i)^[a-z][a-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)"
BASEDIR_RE = r"(?i)^[a-z][a-z0-9+.\-]*://[^/?#]*(/[^?#]*)"
TAG_RE = r"<[^>]*>"


def host_of(url: Column | str) -> Column:
    """Lowercased registered host of a URL (userinfo and port stripped)."""
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def clean_anchor(anchor: Column | str) -> Column:
    """Anchor display text: inner tags stripped, whitespace collapsed."""
    anchor = F.col(anchor) if isinstance(anchor, str) else anchor
    return F.trim(F.regexp_replace(F.regexp_replace(anchor, TAG_RE, " "), r"\s+", " "))


def resolve_href(base: Column, href: Column) -> Column:
    """Resolve ``href`` against the page URL per the module contract.

    Returns NULL for empty/fragment-only hrefs and non-http(s) schemes, so
    callers filter with ``isNotNull``.
    """
    h = F.trim(F.split(href, "#", 2).getItem(0))
    scheme = F.lower(F.regexp_extract(h, SCHEME_RE, 1))
    base_scheme = F.lower(F.regexp_extract(base, SCHEME_RE, 1))
    origin = F.regexp_extract(base, ORIGIN_RE, 1)
    base_path = F.regexp_extract(base, BASEDIR_RE, 1)
    basedir = F.when(
        F.length(base_path) > 0,
        F.concat(origin, F.regexp_replace(base_path, r"[^/]*$", "")),
    ).otherwise(F.concat(origin, F.lit("/")))
    return (
        F.when(h == "", F.lit(None).cast("string"))
        .when(scheme.isin("http", "https"), h)
        .when(scheme != "", F.lit(None).cast("string"))
        .when(h.startswith("//"), F.concat(base_scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(basedir, h))
    )


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, html) pages -> one row per resolvable anchor.

    Output: ``(url, href, anchor, dst_url)`` — href as written, anchor
    display text cleaned, dst_url resolved absolute http(s). ``html`` may
    be the input_hint's ``binary`` column (UTF-8 decoded here) or an
    already-decoded string.
    """
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    zipped = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 1),
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 2),
    )
    out = (
        pages.select(F.col(url_col).alias("url"), F.explode(zipped).alias("z"))
        .select(
            "url",
            F.col("z")["0"].alias("href"),
            clean_anchor(F.col("z")["1"]).alias("anchor"),
        )
        .withColumn("dst_url", resolve_href(F.col("url"), F.col("href")))
    )
    return out.filter(F.col("dst_url").isNotNull())


def link_graph(links: DataFrame, self_loops: bool = False) -> DataFrame:
    """Extracted links -> host-level edge list ``(src_host, dst_host,
    n_links)``. Partial+final hash aggregate; rows with an unparseable
    host on either side are dropped."""
    e = links.select(
        host_of("url").alias("src_host"), host_of("dst_url").alias("dst_host")
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not self_loops:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(F.count("*").alias("n_links"))


def degrees(edges: DataFrame, src: str = "src_host", dst: str = "dst_host") -> DataFrame:
    """Distinct-neighbour in/out degree per node -> (node, out_deg, in_deg).

    Full outer join of the two one-sided aggregates on the shared ``node``
    name (USING-join — the Spark 4.1 UnionBase constraint-rewrite bug
    this sidesteps is documented in operators/kginfer.py's module notes). The distinct edge set feeds BOTH
    aggregates, and Spark's static plan gives the two references no
    ReusedExchange — without a cut the whole upstream (often a full page
    scan -> extract_links -> link_graph) executes twice."""
    from ontology_mapping_spark.operators.graph import _cut

    e = _cut(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    out_d = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_deg"))
    in_d = e.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src_host",
    dst: str = "dst_host",
) -> DataFrame:
    """Fixed-iteration PageRank over a distinct edge set -> (node, rank).

    Semantics (shared exactly by the DuckDB oracle and the pure-Python
    test twin): uniform init 1/N; per iteration
    ``r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + dangling/N)``
    with the dangling mass (rank parked on nodes without out-edges)
    redistributed uniformly, so Σ rank stays 1 every iteration.

    Shape per iteration: one shuffle join of ranks onto edges keyed on
    src, one partial+final sum keyed on dst, plus a 1-row dangling
    aggregate broadcast back in — no driver round-trip inside the loop.
    Lineage is cut per round (session.materialize) exactly like
    transitive_closure; N is the one bounded driver scalar, computed once.
    The loop-invariant frames (distinct edges, node set, out-degrees) are
    materialized ONCE before the loop — each iteration is a fresh action,
    so without the cut Spark re-runs the edge-distinct and node-union
    shuffles every round, tripling per-iteration cost at 10^12 edges.
    """
    e, nodes, n, outdeg = _pagerank_base(edges, src, dst)
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        ranks = _pagerank_step(e, nodes, outdeg, ranks, n, damping)
    return ranks


def _pagerank_base(edges, src, dst, with_outdeg: bool = True):
    """Materialize the loop-invariant frames of a power iteration once:
    (distinct edge set, node set, N, out-degree table — or None when the
    caller doesn't weight by out-degree, e.g. HITS; the cut is eager, so
    an unused table would cost a full groupBy pass over the edge set).
    Every PageRank iteration is its own Spark action, so anything left
    lazy here would re-execute its shuffles each round."""
    from ontology_mapping_spark.operators.graph import _cut

    e = _cut(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    nodes = _cut(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    outdeg = (
        _cut(
            e.groupBy(F.col("src").alias("node")).agg(
                F.count("*").alias("outdeg")
            )
        )
        if with_outdeg
        else None
    )
    return e, nodes, n, outdeg


def _pagerank_step(e, nodes, outdeg, ranks, n, damping):
    """One power-iteration step (shared by the fixed-iteration and the
    warm-started/converged forms): ranks⋈edges on src, partial+final sum
    on dst, 1-row dangling aggregate broadcast back in, lineage cut."""
    from ontology_mapping_spark.operators.graph import _cut

    base = (1.0 - damping) / n
    rk = ranks.join(outdeg, "node", "left")
    contrib = (
        e.join(rk.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
    )
    dangling = rk.filter(F.col("outdeg").isNull()).agg(
        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
    )
    return _cut(
        nodes.join(contrib, "node", "left")
        .crossJoin(F.broadcast(dangling))
        .select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dmass") / n)
            ).alias("rank"),
        )
    )


def pagerank_warm(
    edges: DataFrame,
    ranks0: DataFrame | None = None,
    tol: float = 1e-6,
    max_iters: int = 60,
    damping: float = 0.85,
    src: str = "src_host",
    dst: str = "dst_host",
) -> tuple[DataFrame, int]:
    """Convergence-based PageRank with optional WARM START — the
    crawl-cadence form: a recrawl perturbs a fraction of the link graph,
    and the stationary distribution is independent of the init, so
    seeding from the PREVIOUS crawl's ranks reaches the same fixpoint in
    a fraction of the iterations a cold uniform start needs (each saved
    iteration is one shuffle join + one aggregate over the whole graph —
    the entire per-iteration cost at 10^12 edges).

    -> (ranks, iterations_used). Stops when the L1 step delta
    ``Σ|r'(v) − r(v)|`` drops below ``tol`` (one 1-row aggregate per
    round — the same bounded driver scalar the fixpoint loops already
    pay for their convergence checks); raises ``RuntimeError`` if
    ``max_iters`` rounds don't get there, never returns a silently
    unconverged ranking. Warm-start seeding: nodes carried over keep
    their previous rank, NEW nodes (this crawl's discoveries) seed at
    1/N, departed nodes drop, and the vector renormalizes to Σ=1 so the
    mass-conservation invariant of :func:`pagerank` holds from round
    one. ``pagerank_warm(e, None)`` is the cold convergence twin —
    exactly :func:`pagerank`'s semantics with tol instead of a fixed
    iteration count (equality at the common fixpoint is pinned in
    tests/test_linkgraph.py)."""
    from ontology_mapping_spark.operators.graph import _cut

    e, nodes, n, outdeg = _pagerank_base(edges, src, dst)
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0)), 0
    if ranks0 is None:
        ranks = _cut(nodes.withColumn("rank", F.lit(1.0 / n)))
    else:
        seeded = nodes.join(
            ranks0.select("node", F.col("rank").alias("r0")), "node", "left"
        ).select(
            "node", F.coalesce(F.col("r0"), F.lit(1.0 / n)).alias("rank")
        )
        total = seeded.agg(F.sum("rank").alias("s"))
        ranks = _cut(
            seeded.crossJoin(F.broadcast(total)).select(
                "node", (F.col("rank") / F.col("s")).alias("rank")
            )
        )
    for it in range(1, max_iters + 1):
        nxt = _pagerank_step(e, nodes, outdeg, ranks, n, damping)
        l1 = (
            nxt.join(ranks.withColumnRenamed("rank", "prev"), "node")
            .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("l1"))
            .collect()[0]["l1"]
        )
        ranks = nxt
        if l1 < tol:
            return ranks, it
    raise RuntimeError(
        f"pagerank did not converge to tol={tol} within "
        f"max_iters={max_iters} iterations (damping={damping}); raise "
        "max_iters or loosen tol"
    )


def triangles(
    edges: DataFrame, src: str = "src_host", dst: str = "dst_host"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    UNDIRECTED simple graph underlying a directed edge list ->
    (node, degree, triangles, clustering). The community-structure
    instrument for the host graph: link farms and boilerplate nav rings
    show up as high-clustering blocks, real editorial linking as sparse
    wedges.

    Scale shape — the classic degree-ordered orientation: every
    undirected edge is directed from its (degree, node)-smaller endpoint
    to the larger, which bounds EVERY oriented out-degree at O(√m)
    regardless of hubs (a wikipedia.org with 10^7 neighbours never
    enumerates its own neighbour pairs — its low-degree neighbours each
    enumerate a few). Wedges are then within-row pairs over the sorted
    out-neighbour array (the cooccurrence_edges idiom — one group
    exchange, no self-join), and one equi-join against the oriented edge
    set closes them; each triangle is found exactly once, from its
    smallest corner. Total wedge work is the textbook Σ d_out² ≤ O(m^1.5)
    bound, shuffle = one groupBy + one join, both on oriented keys.

    The three multiply-referenced frames (``und`` 3x, ``deg`` 2x,
    ``oriented`` 2x) are materialized: Spark's static plan gets no
    ReusedExchange across the references (measured: 12 source scans /
    24 exchanges unmaterialized), so without the cuts the edge-distinct
    shuffle would re-execute once per reference — the same
    loop-invariant rule as ``_pagerank_base``, applied within a single
    action's DAG."""
    from ontology_mapping_spark.operators.graph import _cut

    s, d = F.col(src), F.col(dst)
    und = _cut(
        edges.filter(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )
    deg = _cut(
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = _cut(
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(a_first, F.col("dega")).otherwise(F.col("degb")).alias("dlo"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("dhi"),
        )
    )
    # out-neighbour array sorted by the SAME (degree, node) order the
    # orientation uses, so every within-row pair is itself an oriented
    # key and closes against `oriented` directly
    ns = F.array_sort(
        F.collect_list(F.struct(F.col("dhi").alias("d"), F.col("hi").alias("n")))
    )
    grouped = oriented.groupBy("lo").agg(ns.alias("ns"))
    arr = F.col("ns")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x["n"].alias("x"), y["n"].alias("y")),
            ),
        )
    )
    wedges = grouped.select(
        F.col("lo"), F.explode(pairs).alias("p")
    ).select("lo", F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    tri = wedges.join(
        oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y")),
        ["x", "y"],
        "inner",
    )
    corners = tri.select(
        F.explode(F.array("lo", "x", "y")).alias("node")
    )
    tcounts = corners.groupBy("node").agg(F.count("*").alias("triangles"))
    return deg.join(tcounts, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            2.0
            * F.coalesce(F.col("triangles"), F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src_host",
    dst: str = "dst_host",
    max_iters: int = 100,
) -> DataFrame:
    """The k-core of the undirected simple graph underlying a directed
    edge list: the maximal subgraph in which every node has degree ≥ k ->
    its node set ``(node, degree)`` with degrees measured INSIDE the
    core. Dense-block extraction for the host graph (link farms survive
    high k, editorial periphery peels away); ``k_core(e, 2)`` is the
    standard pre-filter before triangle/community work.

    Shape: iterative peel — per round one degree aggregate (partial+final
    count) and one semi-join of the edge set against surviving nodes on
    BOTH endpoints; every round strictly shrinks the edge set or
    terminates, lineage cut per round. Round count is the peel depth
    (bounded by the degeneracy ordering's layer count — single digits on
    power-law web graphs, NOT O(n): each round removes every node below k
    simultaneously); ``max_iters`` overflow raises rather than returning
    a not-yet-maximal subgraph."""
    from ontology_mapping_spark.operators.graph import _cut

    if k < 1:
        raise ValueError(f"k_core needs k >= 1, got {k}")
    s, d = F.col(src), F.col(dst)
    e = (
        edges.filter(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )
    e = _cut(e)
    n_edges = e.count()
    for _ in range(max_iters):
        if n_edges == 0:
            break
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).select("node")
        e2 = _cut(
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
        )
        n2 = e2.count()
        if n2 == n_edges:
            return deg.filter(F.col("degree") >= k)
        e, n_edges = e2, n2
    if n_edges == 0:
        # fully peeled: empty core, empty frame with the right schema
        return (
            e.select(F.col("a").alias("node"))
            .withColumn("degree", F.lit(0).cast("long"))
            .limit(0)
        )
    raise RuntimeError(
        f"k_core(k={k}) did not stabilize within max_iters={max_iters} "
        "peel rounds; raise max_iters"
    )


def hits(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src_host",
    dst: str = "dst_host",
) -> DataFrame:
    """Kleinberg HITS over a distinct directed edge set ->
    (node, hub, authority). PageRank's complement for the host graph:
    authority separates linked-TO quality from hub (directory/portal)
    quality, the pair the KG pipeline uses to weight triple confidence
    by where a mention was found vs what the page points at.

    Semantics (shared exactly by the DuckDB oracle and the numpy twin in
    tests): hubs init 1.0; per iteration
    ``a(v) = Σ_{u→v} h(u)`` then L2-normalize, ``h(u) = Σ_{u→v} a(v)``
    then L2-normalize. Nodes without in-links get authority 0, without
    out-links hub 0 (they still receive in the other role).

    Scale shape: identical to :func:`pagerank` — the loop-invariant
    frames (distinct edges, node set) materialize once via
    `_pagerank_base`; per iteration two shuffle joins (edges⋈scores on
    src, then on dst), two partial+final sums, and two 1-row L2-norm
    aggregates broadcast back in (crossJoin of a broadcast 1-row frame —
    no driver round-trip); lineage cut per round."""
    from ontology_mapping_spark.operators.graph import _cut

    if iters < 1:
        raise ValueError(f"hits needs iters >= 1, got {iters}")
    e, nodes, n, _ = _pagerank_base(edges, src, dst, with_outdeg=False)
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )

    def _l2norm(df: DataFrame, col: str) -> DataFrame:
        norm = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n"))
        return df.crossJoin(F.broadcast(norm)).select(
            "node",
            F.when(F.col("_n") > 0, F.col(col) / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = None
    for _ in range(iters):
        auth = _cut(
            _l2norm(
                e.join(hub.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub").alias("authority")),
                "authority",
            )
        )
        hub = _cut(
            _l2norm(
                e.join(auth.withColumnRenamed("node", "dst"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("authority").alias("hub")),
                "hub",
            )
        )
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
        )
    )


def anchor_aliases(links: DataFrame, min_count: int = 1) -> DataFrame:
    """Anchor-text alias mining: how the web names each target page.

    -> (alias, dst_url, n) with alias = lowercased cleaned anchor text,
    empty aliases dropped, pairs below ``min_count`` dropped. This is the
    surface-form table entity linking consumes — the web-scale analogue of
    the reference's label/synonym extraction."""
    out = (
        links.select(F.lower(F.col("anchor")).alias("alias"), "dst_url")
        .filter(F.col("alias") != "")
        .groupBy("alias", "dst_url")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def crawl_frontier(
    links: DataFrame,
    seen: DataFrame | None = None,
    blocked: DataFrame | None = None,
    per_host: int = 100,
) -> DataFrame:
    """Next-crawl URL list from this crawl's extracted links ->
    ``(host, url, n_refs, rank)`` — the crawler-feedback stage that
    closes the ingest loop (extract_links → frontier → next shards).

    Pipeline: distinct destination URLs with their reference count (the
    default priority — how much of the web points there), minus already
    crawled urls (``seen``, 1-column ``url``), minus blocked hosts
    (:func:`filter_blocked_hosts`'s broadcast suffix anti-join), then a
    PER-HOST budget: top ``per_host`` urls per host by (n_refs desc,
    url) — politeness, and the reason this is a window top-k and not a
    global sort (a global order-by funnels the whole frontier through
    one reducer; the per-host row_number is the InferWindowGroupLimit
    shape the engine already uses for topk_per_group).

    Scale: the reference count is a partial+final aggregate on dst_url
    (billions of links collapse map-side); seen is a left-anti join on
    the url key (both sides frontier-shaped); hosts never concentrate —
    the window key IS the politeness unit."""
    from pyspark.sql import Window

    cand = (
        links.select("dst_url")
        .groupBy("dst_url")
        .agg(F.count("*").alias("n_refs"))
        .withColumn("host", host_of("dst_url"))
        .filter(F.col("host") != "")
    )
    if seen is not None:
        cand = cand.join(
            seen.select(F.col("url").alias("dst_url")), "dst_url", "left_anti"
        )
    if blocked is not None:
        # the host column two lines up is exactly what the suffix
        # anti-join needs — reuse it instead of re-running the regex
        cand = filter_blocked_hosts(cand, blocked, host_col="host")
    w = Window.partitionBy("host").orderBy(
        F.col("n_refs").desc(), F.col("dst_url")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_host)
        .select("host", F.col("dst_url").alias("url"), "n_refs", "rank")
    )


def filter_blocked_hosts(
    pages: DataFrame, blocked: DataFrame, url_col: str = "url",
    host_col: str | None = None,
) -> DataFrame:
    """Drop pages whose host is a blocked domain or any subdomain of one.

    ``blocked`` is a 1-column (domain) DataFrame, small by contract
    (curation blocklists are thousands of rows) — broadcast to every
    executor so the anti-join never shuffles the page corpus.

    ``host_col``: name of an ALREADY-computed host column to compare
    against, skipping the per-row ``host_of`` regex pass — callers that
    just derived the host (crawl_frontier) must not pay it twice."""
    if host_col is None:
        pages = pages.withColumn("_host", host_of(url_col))
        host_col, tmp = "_host", True
    else:
        tmp = False
    cond = (F.col(host_col) == F.col("domain")) | F.col(host_col).endswith(
        F.concat(F.lit("."), F.col("domain"))
    )
    out = pages.join(F.broadcast(blocked), cond, "left_anti")
    return out.drop("_host") if tmp else out
