"""KG-maintenance stress: merge a crawl-sized observation delta into a
large provenance state and time the shapes that matter.

Synthesizes both sides with ``spark.range`` (generated on the executors,
no driver loop): a state of N triples and a delta of M observations with
a controlled re-observation overlap, then times

* ``merge_triples``      — the full-outer provenance upsert;
* ``latest_captures``    — recrawl dedup over R captures/url;
* ``incremental_components`` vs full ``connected_components`` on a
  forest at two delta fractions (1/5 stress, 1/50 realistic crawl
  cadence) — the claimed quotient-graph win, measured.

Prints ONE JSON line. Usage::

    python tools/stress_kgmaint.py [--rows 10000000] [--cpus 32]
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
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontology_mapping_spark.operators import graph as G
    from ontology_mapping_spark.operators.kgmaint import (
        latest_captures,
        merge_triples,
    )
    from ontology_mapping_spark.session import get_spark

    spark = get_spark(
        "stress_kgmaint", parallelism=args.cpus, shuffle_partitions=args.cpus
    )
    n = args.rows
    out: dict = {"metric": "kgmaint_stress", "rows": n, "cpus": args.cpus}

    def burn() -> float:
        t = time.time()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        return round(time.time() - t, 3)

    out["py_burn_sec"] = burn()

    # --- provenance upsert: N-triple state, N observations, 50% re-observed
    rid = F.col("id")
    state = (
        spark.range(n)
        .select(
            F.concat(F.lit("s:"), (rid % (n // 2)).cast("string")).alias("subject"),
            F.lit("p").alias("predicate"),
            F.concat(F.lit("o:"), rid.cast("string")).alias("object"),
            F.to_date(F.lit("2024-01-01")).alias("first_seen"),
            F.to_date(F.lit("2024-01-31")).alias("last_seen"),
            F.lit(1).cast("long").alias("support"),
        )
        .cache()
    )
    delta = (
        spark.range(n)
        .select(
            F.concat(F.lit("s:"), (rid % (n // 2)).cast("string")).alias("subject"),
            F.lit("p").alias("predicate"),
            # half the observations hit existing objects, half are new
            F.concat(
                F.lit("o:"),
                F.when(rid % 2 == 0, rid).otherwise(rid + n).cast("string"),
            ).alias("object"),
            F.date_add(F.to_date(F.lit("2024-02-01")), (rid % 28).cast("int")).alias("ts"),
        )
        .cache()
    )
    state.count(), delta.count()  # materialize inputs outside the timed region
    t0 = time.time()
    merged_n = merge_triples(state, delta).count()
    out["merge"] = {
        "state_rows": n,
        "delta_rows": n,
        "merged_rows": merged_n,
        "sec": round(time.time() - t0, 2),
        "rows_per_sec": round(2 * n / (time.time() - t0), 1),
    }

    # --- recrawl dedup: n pages, 5 captures each
    caps = spark.range(n).select(
        F.concat(F.lit("u:"), (rid % (n // 5)).cast("string")).alias("url"),
        F.to_timestamp(
            F.lit("2024-01-01 00:00:00")
        ).alias("base"),
        rid.alias("okey"),
        (rid % 97).cast("double").alias("payload"),
    ).select(
        "url",
        F.col("base").alias("warc_ts"),
        "okey",
        "payload",
    ).cache()
    caps.count()
    t0 = time.time()
    kept = latest_captures(caps, tie_cols=["okey"]).count()
    out["latest_captures"] = {
        "captures": n,
        "urls": kept,
        "sec": round(time.time() - t0, 2),
        "rows_per_sec": round(n / (time.time() - t0), 1),
    }

    # --- incremental CC vs full recompute at two delta fractions: 20% is
    # the stress case (the quotient graph is still 1/5 of the forest);
    # 1/50 is the realistic crawl-delta shape the operator exists for
    m = max(n // 10, 1000)
    out["incremental_cc"] = []
    for mod in (5, 50):
        edges = spark.range(2, m).select(
            rid.cast("string").alias("u"),
            (rid / 2).cast("bigint").cast("string").alias("v"),
            (rid % mod == 0).alias("is_delta"),
        ).cache()
        edges.count()
        initial = edges.filter(~F.col("is_delta")).select("u", "v")
        delta_e = edges.filter(F.col("is_delta")).select("u", "v")
        assign = G.connected_components(initial).cache()
        assign.count()  # the standing assignment predates the crawl
        t0 = time.time()
        inc_n = G.incremental_components(assign, delta_e).count()
        t_inc = time.time() - t0
        t0 = time.time()
        full_n = G.connected_components(edges.select("u", "v")).count()
        t_full = time.time() - t0
        out["incremental_cc"].append({
            "edges": m - 2,
            "delta_edges_frac": round(1 / mod, 3),
            "rows_incremental": inc_n,
            "rows_full": full_n,
            "sec_incremental": round(t_inc, 2),
            "sec_full_recompute": round(t_full, 2),
            "speedup": round(t_full / t_inc, 2) if t_inc else None,
        })
        edges.unpersist(); assign.unpersist()
    out["py_burn_sec_end"] = burn()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
