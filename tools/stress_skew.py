"""Skew-key stress: unsalted vs salted blocking join on a hot token.

The north rule calls for "skew-key salting on hot entities". The hazard is
NOT the join's cross-product codegen (one thread streams ~70M joined rows/s
through a noop sink on this VM — measured below as the `join_stage_only`
control): it is the SHUFFLE WRITE of the join's output. The real operator
ends in a pair-dedup `distinct`, so the task that owns the hot token must
serialize the entire hot cross product to the dedup exchange single-handedly
while every other task idles. AQE's skew-join cannot fix this class: it
splits partitions by shuffle INPUT bytes, and a hot token's input is two
small posting lists — the explosion is the output.

This driver plants one hot token whose cross product is ~50x the cold
output, then times the full public operators:

* ``blocking_join``            — unsalted (the naive plan),
* ``salted_blocking_join``     — blanket S-way salt (replicates ALL target
                                 postings S-fold),
* ``hot_salted_blocking_join`` — targeted: only detected hot tokens salt.

Usage: python tools/stress_skew.py  [env SPARK_GRAFT_CPUS,
SPARK_GRAFT_SKEW_HOT_M = millions of hot pairs, default 25]
Prints one JSON line; recorded in BENCH.md and (via bench.py) BENCH_r{N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from ontology_mapping_spark.config import PipelineConfig  # noqa: E402
from ontology_mapping_spark.operators.blocking import (  # noqa: E402
    auto_hot_pairs_threshold,
    blocking_join,
    hot_salted_blocking_join,
    posting_lists,
    salted_blocking_join,
)
from ontology_mapping_spark.session import get_spark  # noqa: E402


def _py_burn_sec() -> float:
    """Host-speed control (same fixed workload as bench.py): one sample
    per variant rep, so a host slow phase that hits one variant's cell is
    visible in the artifact instead of silently deciding the comparison
    (the r02/r03 blanket-vs-targeted flip was exactly that ambiguity)."""
    t0 = time.time()
    acc = 0
    for i in range(2_000_000):
        acc = (acc + i * i) % 1000003
    if acc < 0:
        raise AssertionError
    return round(time.time() - t0, 3)


def corpus(spark, n_src=200_000, n_tgt=50_000, hot_every_src=20, hot_every_tgt=20):
    """Two-token labels; every ``hot_every_*``-th row also carries the hot
    token -> hot cross product = (n_src/hs) x (n_tgt/ht) pairs on ONE key
    (defaults: 10k x 2.5k = 25M, ~5x the cold output)."""
    src = spark.range(n_src).select(
        F.concat(F.lit("s"), F.col("id")).alias("uri"),
        F.when(
            F.col("id") % hot_every_src == 0,
            F.concat(F.lit("hotentity x"), F.col("id")),
        )
        .otherwise(
            F.concat(F.lit("u"), F.pmod(F.col("id"), F.lit(40000)), F.lit(" x"), F.col("id"))
        )
        .alias("text"),
    )
    tgt = spark.range(n_tgt).select(
        F.concat(F.lit("t"), F.col("id")).alias("uri"),
        F.when(
            F.col("id") % hot_every_tgt == 0,
            F.concat(F.lit("hotentity y"), F.col("id")),
        )
        .otherwise(
            F.concat(F.lit("v"), F.pmod(F.col("id"), F.lit(15000)), F.lit(" y"), F.col("id"))
        )
        .alias("text"),
    )
    return src, tgt


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    hot_m = float(os.environ.get("SPARK_GRAFT_SKEW_HOT_M", "25"))
    # scale hot density to the requested hot-pair count, keeping the
    # 4:1 src:tgt posting ratio of the default shape
    import math

    hot_src = int(math.sqrt(hot_m * 1e6 * 4))
    hot_tgt = max(1, int(hot_m * 1e6 / hot_src))
    spark = get_spark(
        "skew", parallelism=cpus, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    hot_every_src = max(1, 200_000 // hot_src)
    hot_every_tgt = max(1, 50_000 // hot_tgt)
    src, tgt = corpus(spark, hot_every_src=hot_every_src, hot_every_tgt=hot_every_tgt)
    # actual planted counts (ceil division), not the requested target —
    # the recorded metric must describe the corpus that actually ran
    n_hot_src = (200_000 + hot_every_src - 1) // hot_every_src
    n_hot_tgt = (50_000 + hot_every_tgt - 1) // hot_every_tgt
    src = src.cache()
    tgt = tgt.cache()
    src.count(), tgt.count()
    # keep the hot token: it is a real entity, not a droppable stopword
    cfg = PipelineConfig(max_token_df=1 << 30, salt_buckets=int(cpus))

    reps = int(os.environ.get("SPARK_GRAFT_SKEW_REPS", "2"))

    # control: the join STAGE alone (no dedup shuffle) — shows codegen
    # throughput is not the bottleneck, the shuffle write is
    s_post = posting_lists(src, cfg.max_token_df).withColumnRenamed("uri", "src")
    t_post = posting_lists(tgt, cfg.max_token_df).withColumnRenamed("uri", "tgt")
    # variants as THUNKS, rebuilt inside the timed region each rep:
    # hot_salted_blocking_join runs its hot-token detection eagerly at
    # plan-construction time (localCheckpoint), so building the plan once
    # outside the loop would silently exclude the detection cost from the
    # targeted variant while the others re-run their full plans every rep
    variants = {
        "join_stage_only_unsalted": lambda: s_post.join(t_post, "token").select(
            "src", "tgt"
        ),
        # the real operators (all end in the pair-dedup distinct)
        "unsalted": lambda: blocking_join(src, tgt, cfg),
        "salted_hot_only": lambda: hot_salted_blocking_join(src, tgt, cfg),
        # auto-tuned cutoff (mean per-reducer fan-out) — the production
        # default when no threshold is known for the corpus
        "salted_hot_auto": lambda: hot_salted_blocking_join(
            src, tgt, cfg, hot_pairs_threshold=None
        ),
        "salted_all": lambda: salted_blocking_join(src, tgt, cfg),
    }
    # VARIANTS INTERLEAVED across best-of-N passes: this VM has
    # multi-minute host slow phases (same plan measured 5s and 85s twenty
    # minutes apart) — back-to-back reps of one variant would attribute a
    # slow phase to whichever variant owned it
    results: dict[str, float] = {}
    samples: dict[str, list[float]] = {k: [] for k in variants}
    burns: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for name, build in variants.items():
            burns[name].append(_py_burn_sec())
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 2)
            samples[name].append(dt)
            if name not in results or dt < results[name]:
                results[name] = dt
    n_pairs = hot_salted_blocking_join(src, tgt, cfg).count()
    # the auto threshold this corpus measures to (recorded so the artifact
    # carries the tuned default, not just prose)
    stats = (
        s_post.groupBy("token")
        .agg(F.count("*").alias("df_s"))
        .join(t_post.groupBy("token").agg(F.count("*").alias("df_t")), "token")
        .withColumn("fanout", F.col("df_s") * F.col("df_t"))
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    auto_thr = auto_hot_pairs_threshold(stats, n_parts)
    real = {k: v for k, v in results.items() if k != "join_stage_only_unsalted"}
    recommended = min(real, key=real.get)
    print(
        json.dumps(
            {
                "metric": f"skew_blocking_join_local[{cpus}]",
                "hot_pairs_planted": int(n_hot_src * n_hot_tgt),
                "pairs": n_pairs,
                "sec": results,
                "sec_per_rep": samples,
                "py_burn_per_rep": burns,
                "auto_hot_pairs_threshold": auto_thr,
                # fastest REAL operator on this corpus under burn controls.
                # NOTE scale caveat (operator docstring): blanket salting's
                # S-fold replication is only cheap while the replicated
                # side is small; at the 100 TB design point targeted (auto)
                # is the shape that survives regardless of this cell.
                "recommended_on_this_corpus": recommended,
                "speedup_hot_only_vs_unsalted": round(
                    results["unsalted"] / results["salted_hot_only"], 2
                )
                if results["salted_hot_only"]
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
