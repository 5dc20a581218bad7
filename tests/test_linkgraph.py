"""Link-graph operators vs pure-Python twins.

Three independent derivations cross-check this family: the Spark engine
(operators/linkgraph.py), the DuckDB arithmetic oracles (queries.py, local
gate) and the reference implementations here — a regex-free hand resolver
and a dict-based PageRank power iteration.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ontology_mapping_spark.operators.linkgraph import (
    anchor_aliases,
    degrees,
    extract_links,
    filter_blocked_hosts,
    host_of,
    link_graph,
    pagerank,
)

# --------------------------------------------------------------------- twins


def resolve_py(base: str, href: str) -> str | None:
    """Pure-Python twin of resolve_href (same documented RFC 3986 subset)."""
    h = href.split("#", 1)[0].strip()
    if not h:
        return None
    m = re.match(r"(?i)^([a-z][a-z0-9+.\-]*):", h)
    if m:
        return h if m.group(1).lower() in ("http", "https") else None
    scheme = re.match(r"(?i)^([a-z][a-z0-9+.\-]*):", base).group(1).lower()
    origin = re.match(r"(?i)^([a-z][a-z0-9+.\-]*://[^/?#]*)", base).group(1)
    if h.startswith("//"):
        return f"{scheme}:{h}"
    if h.startswith("/"):
        return origin + h
    path = base[len(origin):].split("?", 1)[0].split("#", 1)[0]
    basedir = origin + (path[: path.rfind("/") + 1] if "/" in path else "/")
    return basedir + h


def pagerank_py(edges: set[tuple[str, str]], iters: int = 5, d: float = 0.85):
    """Dict-based power iteration, same semantics as the engine op."""
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out: dict[str, list[str]] = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if v not in out)
        nxt = {v: 0.0 for v in nodes}
        for s, ts in out.items():
            for t in ts:
                nxt[t] += r[s] / len(ts)
        r = {v: (1 - d) / n + d * (nxt[v] + dangling / n) for v in nodes}
    return r


# ------------------------------------------------------------------- extract

_HTML = b"""<html><body>
<A HREF="/root.html">Home</A>
<a class=x href='https://h2.example.org/x'>Part<b>ner</b></a>
<a href="../up/7.html">rel
line</a>
<a href="#frag">skip</a>
<a href="mailto:a@b.c">mail</a>
<a href="JavaScript:void(0)">js</a>
<a href="//cdn.example.net/a.js">proto</a>
<a href="next.html?q=1#sec">query kept, fragment cut</a>
</body></html>"""

_BASE = "https://user@H1.Example.COM:8443/d/7/page.html?x=1"


def test_extract_links_resolution_branches(spark):
    pages = spark.createDataFrame([(_BASE, bytearray(_HTML))], "url string, html binary")
    rows = {r.href: r for r in extract_links(pages).collect()}
    # dropped: fragment-only, mailto, javascript (case-insensitive scheme)
    assert set(rows) == {
        "/root.html",
        "https://h2.example.org/x",
        "../up/7.html",
        "//cdn.example.net/a.js",
        "next.html?q=1#sec",   # href is emitted as written; resolution cuts the fragment
    }
    origin = "https://user@H1.Example.COM:8443"
    assert rows["/root.html"].dst_url == origin + "/root.html"
    assert rows["https://h2.example.org/x"].dst_url == "https://h2.example.org/x"
    assert rows["../up/7.html"].dst_url == origin + "/d/7/../up/7.html"
    assert rows["//cdn.example.net/a.js"].dst_url == "https://cdn.example.net/a.js"
    assert rows["next.html?q=1#sec"].dst_url == origin + "/d/7/next.html?q=1"
    # anchor cleaning: nested tags stripped, newlines collapsed
    assert rows["https://h2.example.org/x"].anchor == "Part ner"
    assert rows["../up/7.html"].anchor == "rel line"
    # engine == python twin on every emitted href
    for r in rows.values():
        assert r.dst_url == resolve_py(_BASE, r.href)


_HREF_CASES = [
    "a.html", "./a.html", "../a.html", "a/b/c.html?q=2", "/abs/path",
    "//host.example/p", "https://other.example/p", "HTTP://UPPER.example/p",
    "ftp://drop.example/f", "mailto:x@y", "javascript:void(0)", "#only-frag",
    "", "  spaced.html  ", "p#frag", "/p?q=3#frag", "tel:+123", "data:text/plain,x",
]


@pytest.mark.parametrize("base", [
    "https://h.example.com/d/7/page.html",
    "http://h.example.com",          # originless path -> basedir is '/'
    "https://h.example.com/one.html?q=9",
])
def test_resolve_matches_python_twin(spark, base):
    html = "".join(f'<a href="{h}">t</a>' for h in _HREF_CASES)
    pages = spark.createDataFrame([(base, html)], "url string, html string")
    got = {r.href: r.dst_url for r in extract_links(pages).collect()}
    want = {}
    for h in _HREF_CASES:
        r = resolve_py(base, h)
        if r is not None:
            want[h] = r
    assert got == want


def test_host_of(spark):
    df = spark.createDataFrame(
        [("https://User@H3.Example.COM:8080/p?q=1",), ("not a url",)], "u string"
    )
    got = [r.h for r in df.select(host_of("u").alias("h")).collect()]
    assert got == ["h3.example.com", ""]


# ------------------------------------------------------- graph + aggregates

_EDGES = {
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),            # d never linked-to
    ("e", "f"),            # f dangling, separate component
    ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "e"),
}


def _edges_df(spark):
    return spark.createDataFrame(
        sorted(_EDGES), "src_host string, dst_host string"
    )


def test_pagerank_matches_power_iteration(spark):
    got = {r.node: r.rank for r in pagerank(_edges_df(spark), iters=5).collect()}
    want = pagerank_py(_EDGES, iters=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # dangling redistribution keeps total mass exactly 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_duplicate_edges_are_set_semantics(spark):
    dup = _edges_df(spark).union(_edges_df(spark))
    got = {r.node: r.rank for r in pagerank(dup, iters=3).collect()}
    want = pagerank_py(_EDGES, iters=3)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_degrees(spark):
    got = {r.node: (r.out_deg, r.in_deg) for r in degrees(_edges_df(spark)).collect()}
    assert got["hub"] == (4, 0)
    assert got["c"] == (1, 4)   # in: a, b, d, hub
    assert got["f"] == (0, 1)
    assert set(got) == {u for e in _EDGES for u in e}


def test_link_graph_drops_self_loops_and_counts(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/2", "https://b.com/y"),
            ("https://a.com/3", "https://a.com/self"),
            ("https://a.com/4", "https://A.com/CASE"),   # self after lowering
            ("nohost", "https://b.com/z"),               # unparseable src
        ],
        "url string, dst_url string",
    )
    got = {(r.src_host, r.dst_host): r.n_links for r in link_graph(links).collect()}
    assert got == {("a.com", "b.com"): 2}
    with_loops = {
        (r.src_host, r.dst_host): r.n_links
        for r in link_graph(links, self_loops=True).collect()
    }
    assert with_loops == {("a.com", "b.com"): 2, ("a.com", "a.com"): 2}


def test_anchor_aliases_min_count(spark):
    links = spark.createDataFrame(
        [
            ("u1", "Apple  Inc", "https://t/1"),
            ("u2", "apple inc", "https://t/1"),
            ("u3", "AAPL", "https://t/1"),
            ("u4", "", "https://t/1"),
        ],
        "url string, anchor string, dst_url string",
    )
    # extract_links already cleaned anchors; aliases only lowercase here
    got = {(r.alias, r.dst_url): r.n for r in anchor_aliases(links).collect()}
    assert got[("aapl", "https://t/1")] == 1
    assert ("", "https://t/1") not in got
    top = {(r.alias, r.dst_url): r.n for r in anchor_aliases(links, min_count=2).collect()}
    assert top == {("apple  inc", "https://t/1"): 2} or top == {}
    # NB 'Apple  Inc' keeps its double space: cleaning happens at extraction


def test_filter_blocked_hosts(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://ads.example.com/x"),
            (2, "https://sub.ads.example.com/x"),   # subdomain of blocked
            (3, "https://notads.example.com/x"),    # suffix must not match
            (4, "https://clean.example.org/x"),
        ],
        "doc_id int, url string",
    )
    blocked = spark.createDataFrame([("ads.example.com",)], "domain string")
    kept = sorted(r.doc_id for r in filter_blocked_hosts(pages, blocked).collect())
    assert kept == [3, 4]
    plan = filter_blocked_hosts(pages, blocked)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_pagerank_empty_graph(spark):
    empty = spark.createDataFrame([], "src_host string, dst_host string")
    assert pagerank(empty, iters=2).count() == 0


# ------------------------------------------------------- pagerank_warm


def _converged_py(edges, tol=1e-12, d=0.85):
    # run the dict twin to (numerical) convergence — the unique fixpoint
    r = pagerank_py(edges, iters=0, d=d)
    for _ in range(500):
        nxt = pagerank_py_step(edges, r, d)
        if sum(abs(nxt[v] - r[v]) for v in r) < tol:
            return nxt
        r = nxt
    raise AssertionError("twin did not converge")


def pagerank_py_step(edges, r, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out: dict[str, list[str]] = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    dangling = sum(r[v] for v in nodes if v not in out)
    nxt = {v: 0.0 for v in nodes}
    for s, ts in out.items():
        for t in ts:
            nxt[t] += r[s] / len(ts)
    return {v: (1 - d) / n + d * (nxt[v] + dangling / n) for v in nodes}


def test_pagerank_warm_cold_reaches_the_fixpoint(spark):
    from ontology_mapping_spark.operators.linkgraph import pagerank_warm

    ranks, its = pagerank_warm(_edges_df(spark), tol=1e-10, max_iters=200)
    got = {r.node: r.rank for r in ranks.collect()}
    want = _converged_py(_EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-7)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert its > 1


def test_pagerank_warm_start_fewer_iterations_same_answer(spark):
    from ontology_mapping_spark.operators.linkgraph import pagerank_warm

    prev, cold_iters0 = pagerank_warm(
        _edges_df(spark), tol=1e-9, max_iters=200
    )
    # a recrawl perturbs the graph: one new edge
    new_edges = _EDGES | {("d", "b")}
    ndf = spark.createDataFrame(
        sorted(new_edges), "src_host string, dst_host string"
    )
    cold, cold_iters = pagerank_warm(ndf, tol=1e-9, max_iters=200)
    warm, warm_iters = pagerank_warm(ndf, ranks0=prev, tol=1e-9, max_iters=200)
    gc = {r.node: r.rank for r in cold.collect()}
    gw = {r.node: r.rank for r in warm.collect()}
    for v in gc:
        assert gw[v] == pytest.approx(gc[v], abs=1e-6)
    assert warm_iters < cold_iters  # the warm start is the point


def test_pagerank_warm_new_and_departed_nodes(spark):
    from ontology_mapping_spark.operators.linkgraph import pagerank_warm

    prev, _ = pagerank_warm(_edges_df(spark), tol=1e-9, max_iters=200)
    # g is new; e->f departed (e, f leave the node set entirely)
    new_edges = (_EDGES - {("e", "f")}) | {("g", "a"), ("hub", "g")}
    ndf = spark.createDataFrame(
        sorted(new_edges), "src_host string, dst_host string"
    )
    warm, _ = pagerank_warm(ndf, ranks0=prev, tol=1e-10, max_iters=200)
    got = {r.node: r.rank for r in warm.collect()}
    want = _converged_py(new_edges)
    assert set(got) == set(want)  # e/f gone, g present
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-7)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_warm_unreachable_tol_raises(spark):
    from ontology_mapping_spark.operators.linkgraph import pagerank_warm

    with pytest.raises(RuntimeError, match="max_iters"):
        pagerank_warm(_edges_df(spark), tol=0.0, max_iters=3)


# ----------------------------------------------------------------- triangles


def test_triangles_matches_networkx(spark):
    import networkx as nx

    from ontology_mapping_spark.operators.linkgraph import triangles

    # directed duplicates, reverse duplicates and self-loops must all
    # collapse into the simple undirected graph before counting
    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("b", "c"), ("c", "d"),
        ("d", "a"), ("d", "b"), ("e", "e"), ("e", "f"), ("a", "b"),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {
        r.node: (r.degree, r.triangles, r.clustering)
        for r in triangles(df).collect()
    }
    g = nx.Graph()
    g.add_edges_from((s, t) for s, t in edges if s != t)
    tri, clu, deg = nx.triangles(g), nx.clustering(g), dict(g.degree())
    assert set(got) == set(g.nodes())
    for v in g.nodes():
        assert got[v][0] == deg[v], v
        assert got[v][1] == tri[v], v
        assert got[v][2] == pytest.approx(clu[v], abs=1e-12), v


def test_triangles_star_and_clique(spark):
    from ontology_mapping_spark.operators.linkgraph import triangles

    # star: the hub's neighbour pairs are never enumerated BY the hub
    # (orientation points every edge leaf->hub) and there are no triangles
    star = [("hub", f"leaf{i}") for i in range(8)]
    got = {r.node: r.triangles for r in triangles(
        spark.createDataFrame(star, "src_host string, dst_host string")
    ).collect()}
    assert all(v == 0 for v in got.values())
    # K5: every node sits in C(4,2)=6 triangles, clustering exactly 1.0
    k5 = [(f"n{i}", f"n{j}") for i in range(5) for j in range(5) if i < j]
    rows = triangles(
        spark.createDataFrame(k5, "src_host string, dst_host string")
    ).collect()
    assert all(r.degree == 4 and r.triangles == 6 for r in rows)
    assert all(r.clustering == pytest.approx(1.0) for r in rows)


# -------------------------------------------------------------------- k-core


def test_k_core_matches_networkx(spark):
    import networkx as nx

    from ontology_mapping_spark.operators.linkgraph import k_core

    # K4 clique + a tail path hanging off it + an isolated edge: the
    # 2-core peels the tail in cascading rounds, the 3-core is exactly K4
    edges = (
        [(f"c{i}", f"c{j}") for i in range(4) for j in range(4) if i < j]
        + [("c0", "t1"), ("t1", "t2"), ("t2", "t3")]
        + [("x", "y")]
    )
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    g = nx.Graph(edges)
    for k in (1, 2, 3, 4):
        core = nx.k_core(g, k)
        got = {r.node: r.degree for r in k_core(df, k).collect()}
        assert set(got) == set(core.nodes()), k
        for v, dd in core.degree():
            assert got[v] == dd, (k, v)


def test_k_core_duplicate_and_self_loop_edges(spark):
    from ontology_mapping_spark.operators.linkgraph import k_core

    edges = [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("c", "a")]
    got = {r.node: r.degree for r in k_core(
        spark.createDataFrame(edges, "src_host string, dst_host string"), 2
    ).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}  # the triangle survives


def test_k_core_fully_peeled_is_empty_with_schema(spark):
    from ontology_mapping_spark.operators.linkgraph import k_core

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src_host string, dst_host string"
    )
    out = k_core(df, 3)
    assert out.columns == ["node", "degree"]
    assert out.count() == 0


def test_k_core_validates_k(spark):
    from ontology_mapping_spark.operators.linkgraph import k_core

    df = spark.createDataFrame([("a", "b")], "src_host string, dst_host string")
    with pytest.raises(ValueError, match="k >= 1"):
        k_core(df, 0)


# ------------------------------------------------------------------ HITS


def hits_py(edges: set[tuple[str, str]], iters: int = 5):
    """Pure-Python twin of operators/linkgraph.hits: hubs init 1.0,
    authority = in-sum of hubs then L2-normalize, hub = out-sum of
    authorities then L2-normalize."""
    import math

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {v: 1.0 for v in nodes}
    a = {v: 0.0 for v in nodes}
    for _ in range(iters):
        a = {v: sum(h[u] for u, w in edges if w == v) for v in nodes}
        na = math.sqrt(sum(x * x for x in a.values()))
        a = {v: (x / na if na > 0 else 0.0) for v, x in a.items()}
        h = {u: sum(a[w] for uu, w in edges if uu == u) for u in nodes}
        nh = math.sqrt(sum(x * x for x in h.values()))
        h = {u: (x / nh if nh > 0 else 0.0) for u, x in h.items()}
    return h, a


def test_hits_matches_python_twin(spark):
    from ontology_mapping_spark.operators.linkgraph import hits

    rows = hits(_edges_df(spark), iters=5).collect()
    hub = {r.node: r.hub for r in rows}
    auth = {r.node: r.authority for r in rows}
    want_h, want_a = hits_py(_EDGES, iters=5)
    assert set(hub) == set(want_h)
    for v in want_h:
        assert hub[v] == pytest.approx(want_h[v], abs=1e-12), ("hub", v)
        assert auth[v] == pytest.approx(want_a[v], abs=1e-12), ("auth", v)
    # both vectors L2-normalized after the final iteration
    assert sum(x * x for x in hub.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(x * x for x in auth.values()) == pytest.approx(1.0, abs=1e-9)
    # role zeros: 'd' is never linked to (authority 0); 'f' never links
    # out (hub 0) — both still score in their other role
    assert auth["d"] == 0.0 and hub["d"] > 0
    assert hub["f"] == 0.0 and auth["f"] > 0


def test_hits_duplicate_edges_are_set_semantics(spark):
    from ontology_mapping_spark.operators.linkgraph import hits

    dup = _edges_df(spark).union(_edges_df(spark))
    rows = hits(dup, iters=3).collect()
    want_h, want_a = hits_py(_EDGES, iters=3)
    for r in rows:
        assert r.hub == pytest.approx(want_h[r.node], abs=1e-12)
        assert r.authority == pytest.approx(want_a[r.node], abs=1e-12)


def test_hits_empty_graph_and_iter_validation(spark):
    from ontology_mapping_spark.operators.linkgraph import hits

    empty = spark.createDataFrame([], "src_host string, dst_host string")
    out = hits(empty, iters=2)
    assert out.columns == ["node", "hub", "authority"]
    assert out.count() == 0
    with pytest.raises(ValueError, match="iters >= 1"):
        hits(_edges_df(spark), iters=0)


# --------------------------------------------------------- crawl_frontier


def test_crawl_frontier_budget_seen_blocked(spark):
    from ontology_mapping_spark.operators.linkgraph import crawl_frontier

    links = spark.createDataFrame(
        [
            # h1: three urls, /a referenced twice (top priority)
            ("http://h1.example/a",), ("http://h1.example/a",),
            ("http://h1.example/b",), ("http://h1.example/c",),
            # h2: one fresh, one already crawled, one on a blocked host
            ("http://h2.example/x",), ("http://h2.example/old",),
            ("http://ads.bad/z",), ("http://sub.ads.bad/z2",),
        ],
        "dst_url string",
    )
    seen = spark.createDataFrame([("http://h2.example/old",)], "url string")
    blocked = spark.createDataFrame([("ads.bad",)], "domain string")
    got = crawl_frontier(links, seen=seen, blocked=blocked, per_host=2)
    rows = {(r.host, r.url): (r.n_refs, r.rank) for r in got.collect()}
    # h1 budget of 2: /a (2 refs, rank 1) then /b (tie with /c broken by url)
    assert rows[("h1.example", "http://h1.example/a")] == (2, 1)
    assert rows[("h1.example", "http://h1.example/b")] == (1, 2)
    assert ("h1.example", "http://h1.example/c") not in rows
    # seen url dropped, blocked host (and subdomain) dropped
    assert rows[("h2.example", "http://h2.example/x")] == (1, 1)
    assert not any(h.endswith("ads.bad") for h, _ in rows)
    assert len(rows) == 3


def test_crawl_frontier_plan_is_window_group_limit(spark):
    from ontology_mapping_spark.operators.linkgraph import crawl_frontier

    links = spark.createDataFrame([("http://h/x",)], "dst_url string")
    plan = (
        crawl_frontier(links, per_host=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the per-host budget must stay the WindowGroupLimit shape — never a
    # global sort of the frontier
    assert "WindowGroupLimit" in plan
