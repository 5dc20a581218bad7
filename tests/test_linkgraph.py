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
