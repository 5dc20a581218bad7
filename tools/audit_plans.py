"""Plan-shape audit over the whole query registry: the mechanized form
of the brief's "explain the plan and iterate" rule.

For every ``queries()`` entry (curated + LOCAL_ONLY) this builds the
DataFrame at a small sf and inspects the physical plan string for the
smells that have produced real regressions in this repo. NOTE the plan
is the PRE-EXECUTION AdaptiveSparkPlan (isFinalPlan=false) — no action
runs on the result frame, so AQE's runtime exchange reuse and join
switches are invisible and the ``reused`` stat is ~0 by construction.
That is the right object for the headline signal anyway: a source
re-scan is a STATIC plan-reference property (Spark 4.1 inserts no
ReusedExchange across plan-level references even at runtime for these
shapes — measured on triangles/degrees before their fixes). Only
eagerly-materialized subtrees (fixpoints, _cut calls) execute during
the build. Smells checked:

* ``scans``        — how many times the parquet/Range sources appear:
                     a query whose plan re-scans its source many times
                     is usually missing a materialize on a
                     multiply-referenced frame (the triangles/degrees
                     bug class; ReusedExchange does NOT kick in across
                     plan-level references in Spark 4.1's static plans);
* ``bnlj`` / ``cartesian`` — BroadcastNestedLoopJoin / CartesianProduct
                     nodes: legitimate only for deliberately tiny
                     sides (1-row aggregates broadcast back in, the
                     SPARQL wildcard-EXISTS form);
* ``exchanges``    — total shuffle count (context, not a verdict);
* ``python_eval``  — BatchEvalPython / row-at-a-time Python in the plan
                     (the repo's contract: pandas/Arrow UDFs only, so
                     ArrowEvalPython is fine, BatchEvalPython is a bug).

Building the frame EXECUTES any fixpoint operators inside (they run
jobs while constructing their result), so run this at sf0.001.

Prints one JSON line per flagged query plus a summary line; --all dumps
every row. Usage::

    python tools/audit_plans.py [sf_dir] [name_filter] [--all]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# plans whose BNLJ/cartesian is by design (1-row broadcast aggregates,
# documented wildcard existence joins, fixture-scale parity paths)
EXPECTED_BNLJ_SUBSTR = (
    "pagerank",     # dangling-mass 1-row aggregate crossJoin
    "hits",         # L2-norm 1-row aggregate crossJoin
    "embedding_topk_bruteforce",  # the brute-force form IS |Q|x|C| by contract
    "embedding_near_dup",         # broadcast-probe form (small probe side)
    "ann_ivf",      # centroid assignment = broadcast-codebook nested loop
    "blocked_host_filter",  # endswith anti-join vs a broadcast blocklist
    "crawl_frontier",       # embeds the same broadcast-blocklist suffix join
    "cooccurrence_npmi",    # 1-row corpus-total aggregate broadcast back in
)

# queries whose source re-scans are triaged as acceptable: every extra
# reference is a pushdown-pruned parquet read of the SMALL-by-contract
# side (ontology / KG-schema / key tables), or a documented
# caller-persists-input contract — while closure/fixpoint frames inside
# them are checkpointed (LogicalRDD, not re-scanned). Reason strings keep
# the triage reviewable; a NEW name showing up flagged is the signal.
EXPECTED_RESCANS = {
    "shared_ancestor_stats": "pairs+edges parquet re-reads; closure is checkpointed",
    "parent_similarity_maxcos": "ontology-side label/embedding re-reads",
    "lca_depth_overlap": "pairs/edges re-reads around a checkpointed closure",
    "mention_disambiguation": "5 refs to the mentions input are the operator's "
    "documented contract (caller persists at the stage boundary); the "
    "ambiguity aggregate and scored path are materialized inside",
    "kg_shape_violations": "one pushdown-filtered scan per shape constraint "
    "(each reads only its predicate's row groups)",
    "kg_describe_set": "subject/object direction scans per depth, "
    "pushdown-filtered",
    "cooccurrence_npmi": "corpus-total + per-entity aggregates share the "
    "mentions parquet with pruned re-reads",
}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("name_filter", nargs="?", default="")
    ap.add_argument("--all", action="store_true", help="print every row")
    ap.add_argument("--scan-flag", type=int, default=6,
                    help="flag queries whose plan re-scans sources more "
                    "than this many times")
    args = ap.parse_args()

    from ontology_mapping_spark import queries as _q
    from ontology_mapping_spark.session import get_spark

    spark = get_spark(
        "audit_plans",
        parallelism=8,
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    rows = []
    for name, fn in _q.registry().items():
        if args.name_filter and args.name_filter not in name:
            continue
        t0 = time.time()
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:
            rows.append({"name": name, "err": str(ex).splitlines()[0][:120]})
            continue
        stat = {
            "name": name,
            "scans": len(re.findall(r"FileScan|Scan parquet|Range \(", plan)),
            # negative lookbehind: "ReusedExchange " must not double-
            # count as an "Exchange "
            "exchanges": len(re.findall(r"(?<!Reused)Exchange ", plan)),
            "reused": plan.count("ReusedExchange"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "python_eval": plan.count("BatchEvalPython"),
            "arrow_eval": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
            "sec": round(time.time() - t0, 1),
        }
        flags = []
        if stat["scans"] > args.scan_flag:
            if name in EXPECTED_RESCANS:
                stat["expected"] = EXPECTED_RESCANS[name]
            else:
                flags.append(f"rescans source {stat['scans']}x")
        if stat["python_eval"]:
            flags.append("row-at-a-time Python (BatchEvalPython)")
        if (stat["bnlj"] or stat["cartesian"]) and not any(
            s in name for s in EXPECTED_BNLJ_SUBSTR
        ):
            flags.append("nested-loop/cartesian join")
        stat["flags"] = flags
        rows.append(stat)
        if flags or args.all:
            print(json.dumps(stat))
    flagged = [r for r in rows if r.get("flags")]
    expected = [r for r in rows if r.get("expected") and not r.get("flags")]
    errs = [r for r in rows if "err" in r]
    print(json.dumps({
        "metric": "plan_audit",
        "queries": len(rows),
        "flagged": len(flagged),
        "expected": len(expected),
        "errors": len(errs),
        "flagged_names": sorted(r["name"] for r in flagged),
        "expected_names": sorted(r["name"] for r in expected),
        "error_names": sorted(r["name"] for r in errs),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
