"""KG query-layer stress: the kgquery BGP/path/update plans at triple
counts where the scan, not the driver, is the cost — the per-family
throughput evidence backing SCALING.md's "KG lifecycle / Query" claims.

Synthesizes a binary 'broader' tree of N edges plus N labels
(executor-side ``spark.range``, no driver loop), writes it to PARQUET so
every timed query runs against a real columnar scan with pushdown (the
shape the 10^12-row table has), then times one representative query per
plan family:

* ``two_hop``       — the 2-pattern self-join BGP (equi-join on ?y);
* ``neighborhood``  — 2-constant pattern with the broadcast hint
  (node-neighborhood slice: bounded by one node's fan-out);
* ``path_closure``  — ``?x broader+ ?a``: the whole-relation transitive
  closure through path doubling, then an equi-join scan;
* ``nps_scan``      — ``?x !broader ?o``: the complement scan whose
  NOT-IN filter pushes to the reader;
* ``select_agg``    — grouped child-count + ordered top-100
  (map-side-combined aggregate + TakeOrderedAndProject);
* ``update``        — retarget every even-keyed edge to its inverse
  predicate (one broadcast anti-join over the graph scan + plan-level
  union: the graph is read once, never shuffled).

Prints ONE JSON line. Usage::

    python tools/stress_kgquery.py [--edges 2000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontology_mapping_spark.operators.kgquery import (
        bgp_match,
        bgp_match_paths,
        bgp_select,
        update_graph,
    )
    from ontology_mapping_spark.session import get_spark

    spark = get_spark(
        "stress_kgquery", parallelism=args.cpus, shuffle_partitions=args.cpus
    )
    n = args.edges
    out: dict = {"metric": "kgquery_stress", "edges": n, "cpus": args.cpus}

    def burn() -> float:
        t = time.time()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        return round(time.time() - t, 3)

    out["py_burn_sec"] = burn()

    rid = F.col("id")
    sub = spark.range(2, n + 2).select(
        F.concat(F.lit("c:"), rid.cast("string")).alias("subject"),
        F.lit("broader").alias("predicate"),
        F.concat(F.lit("c:"), (rid / 2).cast("bigint").cast("string")).alias(
            "object"
        ),
    )
    lab = spark.range(1, n + 2).select(
        F.concat(F.lit("c:"), rid.cast("string")).alias("subject"),
        F.lit("label").alias("predicate"),
        F.concat(F.lit("node "), rid.cast("string")).alias("object"),
    )
    tmp = tempfile.mkdtemp(prefix="stress_kgquery_")
    path = os.path.join(tmp, "triples")
    sub.unionByName(lab).write.mode("overwrite").parquet(path)
    tr = spark.read.parquet(path)
    total = tr.count()
    out["triples"] = total

    def timed(name: str, fn) -> None:
        t0 = time.time()
        rows = fn()
        sec = time.time() - t0
        out[name] = {
            "rows": rows,
            "sec": round(sec, 2),
            "triples_per_sec": round(total / sec, 1),
        }

    timed(
        "two_hop",
        lambda: bgp_match(
            tr, [("?x", "broader", "?y"), ("?y", "broader", "?z")]
        ).count(),
    )
    timed(
        "neighborhood",
        lambda: bgp_match(
            tr, [("?x", "broader", "c:2"), ("?x", "label", "?l")]
        ).count(),
    )
    timed(
        "path_closure",
        lambda: bgp_match_paths(
            tr, [("?x", "broader+", "?a")], max_iters=30
        ).count(),
    )
    timed(
        "nps_scan",
        lambda: bgp_match_paths(tr, [("?x", "!broader", "?o")]).count(),
    )
    timed(
        "select_agg",
        lambda: len(
            bgp_select(
                tr,
                [("?x", "broader", "?y")],
                group_by=["?y"],
                aggregates=[("count", "*", "?n")],
                select=["?y", "?n"],
                order_by=["?n DESC", "?y"],
                limit=100,
            ).collect()
        ),
    )
    timed(
        "update",
        lambda: update_graph(
            tr,
            [("?x", "broader", "?y")],
            delete=[("?x", "broader", "?y")],
            insert=[("?y", "narrower", "?x")],
            filter_expr="CAST(substring(x, 3) AS LONG) % 2 = 0",
        ).count(),
    )

    out["py_burn_sec_after"] = burn()
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
