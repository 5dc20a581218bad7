"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is materialized through the noop sink (full execution, no
driver collect). Run ``python bench.py --scaling`` to execute the suite at
two parallelism levels (local[8] vs local[32]) in subprocesses and report
throughput + scaling efficiency (the sandbox stand-in for N vs 4N
executors, BASELINE.json north rule).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault("PYTHONPATH", _REPO)

HEADLINE = [
    "mention_detection_flagship",
    "blocking_token_join",
    "transitive_closure",
    "connected_components",
    "shared_ancestor_stats",
    "pricing_summary_agg",
    "topk_per_group",
    "deterministic_sample",
    "minhash_lsh_near_dups",
    "simhash16",
    "embedding_topk_bruteforce",
    "normalize_golden_hash",
]


def run_suite(sf_dir: str, cpus: str) -> dict[str, float]:
    from ontology_mapping_spark import queries as q
    from ontology_mapping_spark.session import get_spark

    spark = get_spark(
        "bench",
        parallelism=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    reg = q.registry()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    spark.stop()
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    if "--scaling" in sys.argv:
        results = {}
        for c in ("8", "32"):
            env = dict(os.environ, SPARK_GRAFT_CPUS=c, SPARK_GRAFT_SF_DIR=sf_dir)
            out = subprocess.run(
                [sys.executable, __file__],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            results[c] = json.loads(out.stdout.strip().splitlines()[-1])
        t8, t32 = results["8"]["value"], results["32"]["value"]
        # efficiency of 4x parallelism: ideal speedup 4 -> eff = (t8/t32)/4
        eff = (t8 / t32) / 4 if t32 > 0 else 0.0
        print(
            json.dumps(
                {
                    "metric": "scaling_local8_vs_local32",
                    "t_local8_sec": t8,
                    "t_local32_sec": t32,
                    "speedup": round(t8 / t32, 3),
                    "efficiency_vs_4x": round(eff, 3),
                    "sf": sf,
                    "queries_local8": results["8"]["queries"],
                    "queries_local32": results["32"]["queries"],
                }
            )
        )
        return

    times = run_suite(sf_dir, cpus)
    print(
        json.dumps(
            {
                "metric": f"headline_suite_runtime_local[{cpus}]",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
