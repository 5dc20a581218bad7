"""Rule-saturation stress: semi-naive RDFS inference at graph sizes where
the closure dwarfs the input, timed against the path-doubling closure.

Synthesizes a binary class tree of N subclass edges (k -> k//2, executor-
side ``spark.range``, no driver loop) plus N/10 typed instances, then
times

* ``saturate`` with the RDFS core (subclass transitivity + type
  inheritance) from cold — the closure is derived BY the rule engine;
* ``saturate`` seeded with ``graph.transitive_closure`` — measured to be
  the WRONG pattern (3x slower at 300k edges): semi-naive delta∘delta
  transitivity is already path doubling, so the seed re-does the same
  work and then pays a naive confirmation round over the closure-sized
  input; kept here so the claim stays measured, not asserted;
* re-saturation of an already-saturated graph — the idempotent
  confirmation pass (one naive round, empty delta).

Prints ONE JSON line. Usage::

    python tools/stress_kginfer.py [--edges 300000] [--cpus 32]
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
    ap.add_argument("--edges", type=int, default=300_000)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontology_mapping_spark.operators import graph as G
    from ontology_mapping_spark.operators.kginfer import rdfs_rules, saturate
    from ontology_mapping_spark.session import get_spark

    spark = get_spark(
        "stress_kginfer", parallelism=args.cpus, shuffle_partitions=args.cpus
    )
    n = args.edges
    out: dict = {"metric": "kginfer_stress", "edges": n, "cpus": args.cpus}

    def burn() -> float:
        t = time.time()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        return round(time.time() - t, 3)

    out["py_burn_sec"] = burn()

    rid = F.col("id")
    sub = (
        spark.range(2, n + 2)
        .select(
            F.concat(F.lit("c:"), rid.cast("string")).alias("subject"),
            F.lit("subClassOf").alias("predicate"),
            F.concat(
                F.lit("c:"), (rid / 2).cast("bigint").cast("string")
            ).alias("object"),
        )
    )
    inst = (
        spark.range(n // 10)
        .select(
            F.concat(F.lit("i:"), rid.cast("string")).alias("subject"),
            F.lit("type").alias("predicate"),
            # instances land on the DEEP half of the tree (long chains)
            F.concat(
                F.lit("c:"), (rid % (n // 2) + n // 2 + 1).cast("string")
            ).alias("object"),
        )
    )
    kg = sub.unionByName(inst).cache()
    kg.count()  # materialize outside the timed region
    rules = rdfs_rules(sub_class="subClassOf", rdf_type="type")

    # --- cold saturation: the rule engine derives the whole closure
    t0 = time.time()
    sat = saturate(kg, rules, max_iters=30)
    sat_n = sat.count()
    cold = time.time() - t0
    out["cold"] = {
        "input_rows": kg.count(),
        "saturated_rows": sat_n,
        "derived_rows": sat_n - kg.count(),
        "sec": round(cold, 2),
        "derived_per_sec": round((sat_n - kg.count()) / cold, 1),
    }

    # --- closure-seeded: path doubling builds the subclass closure in
    # O(log depth) rounds, saturate then only derives type inheritance
    t0 = time.time()
    edges = kg.filter(F.col("predicate") == "subClassOf").select(
        F.col("subject").alias("child"), F.col("object").alias("parent")
    )
    clo = G.transitive_closure(edges, max_iters=30).select(
        F.col("node").alias("subject"),
        F.lit("subClassOf").alias("predicate"),
        F.col("ancestor").alias("object"),
    )
    seeded_in = kg.unionByName(clo)
    sat2 = saturate(seeded_in, rules, max_iters=30)
    sat2_n = sat2.count()
    seeded = time.time() - t0
    out["seeded"] = {
        "saturated_rows": sat2_n,
        "sec": round(seeded, 2),
        "speedup_vs_cold": round(cold / seeded, 2),
    }
    assert sat2_n == sat_n, f"seeded/cold closure mismatch: {sat2_n} vs {sat_n}"

    # --- idempotent confirmation: one naive round, empty delta
    sat_cached = sat.cache()
    sat_cached.count()
    t0 = time.time()
    again_n = saturate(sat_cached, rules, max_iters=30).count()
    out["confirm"] = {"sec": round(time.time() - t0, 2), "rows": again_n}
    assert again_n == sat_n

    # --- crawl-cadence incremental: 2% new instances vs full re-saturation
    from ontology_mapping_spark.operators.kginfer import saturate_incremental

    d = (
        spark.range(n // 50)
        .select(
            F.concat(F.lit("j:"), rid.cast("string")).alias("subject"),
            F.lit("type").alias("predicate"),
            F.concat(
                F.lit("c:"), (rid % (n // 2) + n // 2 + 1).cast("string")
            ).alias("object"),
        )
        .cache()
    )
    d.count()
    t0 = time.time()
    inc_n = saturate_incremental(
        sat_cached, d, rules, max_iters=30, assume_distinct=True
    ).count()
    inc = time.time() - t0
    t0 = time.time()
    full_n = saturate(kg.unionByName(d), rules, max_iters=30).count()
    full = time.time() - t0
    assert inc_n == full_n, f"incremental/full mismatch: {inc_n} vs {full_n}"
    out["incremental"] = {
        "delta_rows": n // 50,
        "new_facts": inc_n - sat_n,
        "inc_sec": round(inc, 2),
        "full_sec": round(full, 2),
        "speedup": round(full / inc, 2),
    }

    # --- crawl-cadence retraction (DRed): withdraw ~0.1% of the subclass
    # edges (leaf-adjacent, the recrawl shape: page revisions retract
    # support for shallow facts far more often than for the spine) and
    # compare delete-and-rederive against full re-saturation of the
    # post-retraction base
    from ontology_mapping_spark.operators.kginfer import retract_incremental

    key = F.substring("subject", 3, 32).cast("bigint")
    rem = (
        sub.filter((key > 3 * n // 4) & (key % 97 == 0))
        .cache()
    )
    n_rem = rem.count()
    t0 = time.time()
    ret_n = retract_incremental(
        sat_cached, kg, rem, rules, max_iters=30, assume_distinct=True
    ).count()
    ret = time.time() - t0
    t0 = time.time()
    keep = kg.join(rem, ["subject", "predicate", "object"], "left_anti")
    full_ret_n = saturate(keep, rules, max_iters=30).count()
    full_ret = time.time() - t0
    assert ret_n == full_ret_n, (
        f"retract/full mismatch: {ret_n} vs {full_ret_n}"
    )
    out["retraction"] = {
        "removed_rows": n_rem,
        "facts_after": ret_n,
        "facts_dropped": sat_n - ret_n,
        "dred_sec": round(ret, 2),
        "full_resat_sec": round(full_ret, 2),
        "speedup": round(full_ret / ret, 2),
    }

    out["py_burn_sec_end"] = burn()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
