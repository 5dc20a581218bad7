"""tools/build_linkgraph.py: the resumable graph-materialize CLI.

Drives the CLI in-process over a tiny synthetic corpus: once from pages
(HTML anchor extraction), once from pre-extracted links (the WAT lane's
shape), and re-runs to pin stage resume.
"""

from __future__ import annotations

import json
import sys


def _run(argv, capsys):
    sys.path.insert(0, "/root/repo/tools")
    try:
        import build_linkgraph
    finally:
        sys.path.pop(0)
    build_linkgraph.main(argv)
    lines = [
        l for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    return json.loads(lines[-1])


def _pages_df(spark):
    html = (
        "<html><body>"
        "<a href='http://b.example/x'>to B</a>"
        "<a href='/rel'>rel</a>"
        "<a href='javascript:void(0)'>drop</a>"
        "</body></html>"
    ).encode()
    return spark.createDataFrame(
        [("http://a.example/dir/page", html)], "url string, html binary"
    )


def test_cli_from_pages_and_resume(spark, tmp_path, capsys):
    pages = str(tmp_path / "pages")
    _pages_df(spark).write.parquet(pages)
    wd = str(tmp_path / "lg")
    out = _run(["--pages", pages, "--workdir", wd], capsys)
    assert out["links"] == 2  # javascript: dropped
    # a.example -> b.example survives; the /rel self-link drops (self loop)
    assert out["host_edges"] == 1
    assert out["resumed_stages"] == []
    rows = spark.read.parquet(f"{wd}/host_edges").collect()
    assert {(r.src_host, r.dst_host, r.n_links) for r in rows} == {
        ("a.example", "b.example", 1)
    }
    # re-run: every stage skips, outputs identical
    out2 = _run(["--pages", pages, "--workdir", wd], capsys)
    assert set(out2["resumed_stages"]) == {
        "links", "host_edges", "degrees", "pagerank", "aliases"
    }
    # a config change invalidates pagerank but not upstream stages
    out3 = _run(
        ["--pages", pages, "--workdir", wd, "--pagerank-iters", "3"], capsys
    )
    assert "pagerank" not in out3["resumed_stages"]


def test_cli_from_links_with_frontier(spark, tmp_path, capsys):
    links = str(tmp_path / "links")
    spark.createDataFrame(
        [
            ("http://a.example/", "http://b.example/1", "one", "http://b.example/1"),
            ("http://a.example/", "http://b.example/2", "two", "http://b.example/2"),
            ("http://c.example/", "http://b.example/1", "one", "http://b.example/1"),
        ],
        "url string, href string, anchor string, dst_url string",
    ).write.parquet(links)
    wd = str(tmp_path / "lg2")
    out = _run(
        [
            "--links", links, "--workdir", wd,
            "--frontier", "--per-host", "1",
            "--pagerank-tol", "1e-6",
        ],
        capsys,
    )
    assert out["host_edges"] == 2  # a->b, c->b
    assert out["iterations"] >= 1  # converged form reports its rounds
    # analytics stages: triangle of hosts a-b-c closes via the triangle
    # flags below; here the undirected graph is a path (a-b-c), so
    # triangles count 0 but every host has a row, and the 1-core is all 3
    out_an = _run(
        [
            "--links", links, "--workdir", wd,
            "--hits", "--triangles", "--k-core", "1",
            "--frontier", "--per-host", "1",
            "--pagerank-tol", "1e-6",
        ],
        capsys,
    )
    assert out_an["hits"] == 3
    assert out_an["triangles"] == 3
    assert out_an["kcore"] == 3
    # adding analytics knobs CHANGES the config hash, so the whole chain
    # rebuilt (the StageRunner contract: any knob change invalidates);
    # an identical re-run then resumes everything including the new stages
    assert out_an["resumed_stages"] == []
    out_re = _run(
        [
            "--links", links, "--workdir", wd,
            "--hits", "--triangles", "--k-core", "1",
            "--frontier", "--per-host", "1",
            "--pagerank-tol", "1e-6",
        ],
        capsys,
    )
    assert {"host_edges", "hits", "triangles", "kcore", "frontier"} <= set(
        out_re["resumed_stages"]
    )
    tri = {
        (r.node, r.triangles)
        for r in spark.read.parquet(f"{wd}/triangles").collect()
    }
    assert tri == {("a.example", 0), ("b.example", 0), ("c.example", 0)}
    hub = {
        r.node: (r.hub, r.authority)
        for r in spark.read.parquet(f"{wd}/hits").collect()
    }
    # only b is linked TO: all authority concentrates there
    assert hub["b.example"][1] > 0.99
    assert hub["a.example"][0] > 0.5 and hub["c.example"][0] > 0.5
    # per-host budget 1: b.example contributes its most-referenced url
    fr = spark.read.parquet(f"{wd}/frontier").collect()
    assert [(r.host, r.url, r.n_refs) for r in fr] == [
        ("b.example", "http://b.example/1", 2)
    ]
