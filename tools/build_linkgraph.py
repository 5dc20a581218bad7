"""Materialize the web link graph from pages or pre-extracted links —
the "graph materialize" stage as a resumable command line.

Inputs: ``--pages`` (the engine's web_pages parquet — anchors extract
with ``linkgraph.extract_links``) or ``--links`` (already-extracted link
rows in the ``url, href, anchor, dst_url`` shape, e.g.
``tools/ingest_warc.py --wat`` output — no HTML ever parsed). Every
artifact lands through ``StageRunner`` (checkpoint/resume + lineage
manifests, the same machinery as the KG pipeline), so a killed run
resumes at the last completed stage and a re-run skips everything:

* ``links``      — only when built from ``--pages``;
* ``host_edges`` — ``link_graph``: (src_host, dst_host, n_links);
* ``degrees``    — distinct-neighbour in/out degree per host;
* ``pagerank``   — fixed-iteration by default; ``--pagerank-tol``
  switches to the converged form (iterations reported);
* ``aliases``    — anchor-text alias mining (``--min-alias-count``);
* ``frontier``   — only with ``--frontier``: per-host budgeted next-crawl
  list, minus ``--seen`` urls and ``--blocked`` hosts;
* ``hits`` / ``triangles`` / ``kcore`` — opt-in analytics stages
  (``--hits``, ``--triangles``, ``--k-core K``): hub/authority scores,
  per-host triangle counts + clustering, and the k-core node set.

Prints ONE JSON line: per-stage row counts + resumed stages. Usage::

    python tools/build_linkgraph.py --pages out/web_pages --workdir out/lg
    python tools/build_linkgraph.py --links out/links --workdir out/lg \\
        --frontier --per-host 50 --blocked blocklist_parquet
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from dataclasses import dataclass

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


@dataclass(frozen=True)
class LinkGraphConfig:
    """The knobs that invalidate downstream stages when changed (the
    StageRunner config hash covers exactly these)."""

    pagerank_iters: int = 5
    pagerank_tol: float | None = None
    pagerank_max_iters: int = 60
    damping: float = 0.85
    min_alias_count: int = 1
    per_host: int = 100
    self_loops: bool = False
    hits_iters: int = 5
    k_core: int | None = None


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description="pages/links parquet -> host graph, pagerank, aliases, frontier"
    )
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="web_pages parquet (url, html, ...)")
    src.add_argument(
        "--links",
        help="pre-extracted link parquet (url, href, anchor, dst_url) — "
        "e.g. ingest_warc --wat output",
    )
    ap.add_argument("--workdir", required=True, help="stage outputs + manifests")
    ap.add_argument("--pagerank-iters", type=int, default=5)
    ap.add_argument(
        "--pagerank-tol", type=float, default=None,
        help="switch pagerank to run-to-convergence at this L1 tolerance",
    )
    ap.add_argument("--pagerank-max-iters", type=int, default=60)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--min-alias-count", type=int, default=1)
    ap.add_argument("--frontier", action="store_true", help="also build the frontier")
    ap.add_argument("--hits", action="store_true", help="also build hub/authority")
    ap.add_argument("--hits-iters", type=int, default=5)
    ap.add_argument(
        "--triangles", action="store_true",
        help="also build per-host triangle counts + clustering",
    )
    ap.add_argument(
        "--k-core", type=int, default=None,
        help="also build the k-core node set at this k",
    )
    ap.add_argument("--per-host", type=int, default=100, help="frontier host budget")
    ap.add_argument("--seen", default=None, help="parquet of already-crawled urls")
    ap.add_argument("--blocked", default=None, help="parquet blocklist (domain)")
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ontology_mapping_spark.operators import linkgraph as L
    from ontology_mapping_spark.plans.stages import StageRunner
    from ontology_mapping_spark.session import get_spark

    cfg = LinkGraphConfig(
        pagerank_iters=args.pagerank_iters,
        pagerank_tol=args.pagerank_tol,
        pagerank_max_iters=args.pagerank_max_iters,
        damping=args.damping,
        min_alias_count=args.min_alias_count,
        per_host=args.per_host,
        hits_iters=args.hits_iters,
        k_core=args.k_core,
    )
    # an in-process caller (tests) already has a session: use it untouched
    # and don't stop it (the kg_query CLI's convention)
    active = SparkSession.getActiveSession()
    owns_session = active is None
    spark = (
        get_spark(
            "build_linkgraph", parallelism=args.cpus, shuffle_partitions=args.cpus
        )
        if owns_session
        else active
    )
    run = StageRunner(spark, args.workdir, cfg)

    if args.pages:
        pages = spark.read.parquet(args.pages)
        links = run.materialize(
            "links", lambda: L.extract_links(pages), ["web_pages"]
        )
        links_input = "links"
    else:
        links = spark.read.parquet(args.links)
        links_input = "links_input"

    edges = run.materialize(
        "host_edges",
        lambda: L.link_graph(links, self_loops=cfg.self_loops),
        [links_input],
    )
    degrees = run.materialize(
        "degrees", lambda: L.degrees(edges), ["host_edges"]
    )

    pr_iters = {}

    def build_pagerank():
        if cfg.pagerank_tol is not None:
            ranks, used = L.pagerank_warm(
                edges,
                None,
                tol=cfg.pagerank_tol,
                max_iters=cfg.pagerank_max_iters,
                damping=cfg.damping,
            )
            pr_iters["iterations"] = used
            return ranks
        return L.pagerank(edges, iters=cfg.pagerank_iters, damping=cfg.damping)

    pagerank = run.materialize("pagerank", build_pagerank, ["host_edges"])
    aliases = run.materialize(
        "aliases",
        lambda: L.anchor_aliases(links, min_count=cfg.min_alias_count),
        [links_input],
    )

    out = {
        "workdir": args.workdir,
        "links": links.count(),
        "host_edges": edges.count(),
        "hosts": degrees.count(),
        "pagerank": pagerank.count(),
        "aliases": aliases.count(),
        **pr_iters,
    }
    if args.hits:
        hits = run.materialize(
            "hits",
            lambda: L.hits(edges, iters=cfg.hits_iters),
            ["host_edges"],
        )
        out["hits"] = hits.count()
    if args.triangles:
        tri = run.materialize(
            "triangles", lambda: L.triangles(edges), ["host_edges"]
        )
        out["triangles"] = tri.count()
    if cfg.k_core is not None:
        kc = run.materialize(
            "kcore", lambda: L.k_core(edges, cfg.k_core), ["host_edges"]
        )
        out["kcore"] = kc.count()
    if args.frontier:
        seen = spark.read.parquet(args.seen) if args.seen else None
        blocked = spark.read.parquet(args.blocked) if args.blocked else None
        # seen/blocked are external inputs: their PATHS feed the build-id
        # chain, so re-pointing either invalidates the frontier stage
        frontier = run.materialize(
            "frontier",
            lambda: L.crawl_frontier(
                links, seen=seen, blocked=blocked, per_host=cfg.per_host
            ),
            [links_input, f"seen:{args.seen}", f"blocked:{args.blocked}"],
        )
        out["frontier"] = frontier.count()
    out["resumed_stages"] = sorted(
        s for s, ev in run.events if ev == "skipped"
    )
    print(json.dumps(out))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
