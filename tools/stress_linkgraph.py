"""Link-graph analytics stress: the host-graph operator family at scale.

Synthesizes a deterministic skewed host graph with ``spark.range`` (no
driver loop, no external data): a binary-tree spine (``v -> v//2``, depth
structure), a modular chord rule (``v -> (7v+3) % K``, closes wedges into
genuine triangles), and a hub rule (every 10th node also links to one of
8 mega-hubs — the everyone-links-to-wikipedia skew the operators must
absorb). Times the shapes that matter:

* ``pagerank``       — fixed 5 iterations, edges/s (the per-iteration
                       shuffle-join + aggregate cost);
* ``pagerank_warm``  — cold convergence vs warm restart after a 0.1%
                       recrawl perturbation: iterations saved IS the
                       claimed win (each saved iteration is one full
                       ranks-join-edges pass);
* ``hits``           — Kleinberg hubs/authorities, 5 fixed iterations
                       (two joins + two sums per iteration);
* ``triangles``      — degree-ordered orientation over the hub-skewed
                       graph (the hubs' neighbour pairs are never
                       enumerated by the hubs);
* ``k_core``         — iterative peel, rounds = peel depth.

Prints ONE JSON line. Usage::

    python tools/stress_linkgraph.py [--edges 2000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontology_mapping_spark.operators.linkgraph import (
        hits,
        k_core,
        pagerank,
        pagerank_warm,
        triangles,
    )
    from ontology_mapping_spark.session import get_spark

    spark = get_spark(
        "stress_linkgraph", parallelism=args.cpus, shuffle_partitions=args.cpus
    )
    n = args.edges // 2  # nodes; each node emits a tree edge + a chord edge
    out: dict = {"metric": "linkgraph_stress", "nodes": n, "cpus": args.cpus}

    def burn() -> float:
        t = time.time()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        return round(time.time() - t, 3)

    out["py_burn_sec"] = burn()

    rid = F.col("id")
    host = F.concat(F.lit("h"), rid.cast("string"))
    tree = spark.range(2, n).select(
        host.alias("src_host"),
        F.concat(F.lit("h"), (rid / 2).cast("bigint").cast("string")).alias(
            "dst_host"
        ),
    )
    chord = spark.range(2, n).select(
        host.alias("src_host"),
        F.concat(F.lit("h"), ((rid * 7 + 3) % (n // 3)).cast("string")).alias(
            "dst_host"
        ),
    )
    hubs = (
        spark.range(2, n)
        .filter(rid % 10 == 0)
        .select(
            host.alias("src_host"),
            F.concat(F.lit("hub"), (rid % 8).cast("string")).alias("dst_host"),
        )
    )
    edges = tree.unionAll(chord).unionAll(hubs).cache()
    m = edges.count()  # materialize outside every timed region
    out["edges"] = m

    # --- fixed-iteration pagerank: the per-iteration join+agg cost
    t0 = time.time()
    pr_rows = pagerank(edges, iters=5).count()
    sec = time.time() - t0
    out["pagerank_5it"] = {
        "rank_rows": pr_rows,
        "sec": round(sec, 2),
        "edge_iters_per_sec": round(5 * m / sec, 1),
    }

    # --- warm restart after a recrawl perturbation: ~0.1% of edges churn
    cold_t0 = time.time()
    prev, cold_iters = pagerank_warm(edges, tol=1e-6, max_iters=100)
    prev = prev.cache()
    prev.count()
    cold_sec = time.time() - cold_t0
    churn = F.xxhash64("src_host", "dst_host") % 1000 == 0
    recrawl = (
        edges.filter(~churn)
        .unionAll(
            edges.filter(churn).select(
                "src_host",
                F.concat(F.lit("h"), F.lit(3)).alias("dst_host"),
            )
        )
        .cache()
    )
    recrawl.count()
    t0 = time.time()
    _, warm_iters = pagerank_warm(recrawl, ranks0=prev, tol=1e-6, max_iters=100)
    warm_sec = time.time() - t0
    t0 = time.time()
    _, re_cold_iters = pagerank_warm(recrawl, tol=1e-6, max_iters=100)
    re_cold_sec = time.time() - t0
    out["pagerank_warm"] = {
        "cold_iters": cold_iters,
        "cold_sec": round(cold_sec, 2),
        "recrawl_cold_iters": re_cold_iters,
        "recrawl_cold_sec": round(re_cold_sec, 2),
        "recrawl_warm_iters": warm_iters,
        "recrawl_warm_sec": round(warm_sec, 2),
        "iters_saved": re_cold_iters - warm_iters,
        "speedup": round(re_cold_sec / warm_sec, 2) if warm_sec else None,
        # At fixture scale each iteration is scheduling-overhead-bound, so
        # iterations saved (the 10^12-edge win: one full ranks⋈edges pass
        # each) can fail to show in wall time; report both honestly.
        "sec_per_iter_cold": round(re_cold_sec / re_cold_iters, 2),
        "sec_per_iter_warm": round(warm_sec / warm_iters, 2),
    }

    # --- HITS (same loop shape as pagerank: two joins + two sums/iter)
    t0 = time.time()
    hits_rows = hits(edges, iters=5).count()
    sec = time.time() - t0
    out["hits_5it"] = {
        "rows": hits_rows,
        "sec": round(sec, 2),
        "edge_iters_per_sec": round(5 * m / sec, 1),
    }

    # --- triangles over the hub-skewed graph
    t0 = time.time()
    tri = triangles(edges)
    tri_rows = tri.count()
    tri_total = tri.agg(F.sum("triangles").alias("t")).collect()[0]["t"] // 3
    sec = time.time() - t0
    out["triangles"] = {
        "node_rows": tri_rows,
        "total_triangles": tri_total,
        "sec": round(sec, 2),
        "edges_per_sec": round(m / sec, 1),
    }

    # --- k-core peel (k=3: the tree periphery peels away)
    t0 = time.time()
    core_rows = k_core(edges, 3).count()
    sec = time.time() - t0
    out["k_core_3"] = {
        "core_nodes": core_rows,
        "sec": round(sec, 2),
        "edges_per_sec": round(m / sec, 1),
    }

    out["py_burn_sec_end"] = burn()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
