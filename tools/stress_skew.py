"""Skew-key stress: unsalted vs salted blocking join on a hot token.

The north rule calls for "skew-key salting on hot entities": a token shared
by a large fraction of both sides concentrates its entire cross product on
one reducer. This driver builds a synthetic corpus with one deliberately
hot token that the df-cap must NOT drop (a legitimate hot entity, not a
stopword), then times:

* blocking_join, AQE skew-join ON (Spark's runtime split),
* blocking_join, AQE skew-join OFF (the naive plan),
* salted_blocking_join (explicit S-way salt, AQE off — worst case).

Usage: python tools/stress_skew.py  [env SPARK_GRAFT_CPUS]
Prints one JSON line; results recorded in BENCH.md.
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
    blocking_join,
    salted_blocking_join,
)
from ontology_mapping_spark.session import get_spark  # noqa: E402


def corpus(spark, n_src=200_000, n_tgt=50_000, hot_every=20):
    """Two-token labels; every ``hot_every``-th row also carries the hot
    token -> hot cross product = (n_src/50) x (n_tgt/50) pairs on ONE key."""
    src = spark.range(n_src).select(
        F.concat(F.lit("s"), F.col("id")).alias("uri"),
        F.when(
            F.col("id") % hot_every == 0,
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
            F.col("id") % hot_every == 0,
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
    spark = get_spark(
        "skew", parallelism=cpus, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    src, tgt = corpus(spark)
    src = src.cache()
    tgt = tgt.cache()
    src.count(), tgt.count()
    # keep the hot token: it is a real entity, not a droppable stopword
    cfg = PipelineConfig(max_token_df=1 << 30, salt_buckets=int(cpus))

    def t(df, reps=2):
        # best-of-N: this VM shows 2-4x run-to-run host noise
        best = None
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    # time the JOIN stage itself (no trailing distinct: the pair-dedup
    # shuffle is uniformly distributed and identical across variants — it
    # only buries the skew signal under its own cost). Built inline from
    # posting_lists, the same plan blocking_join/salted_blocking_join wrap.
    from ontology_mapping_spark.operators.blocking import posting_lists

    s_post = posting_lists(src, cfg.max_token_df).withColumnRenamed("uri", "src")
    t_post = posting_lists(tgt, cfg.max_token_df).withColumnRenamed("uri", "tgt")
    unsalted = s_post.join(t_post, "token").select("src", "tgt")
    S = cfg.salt_buckets
    s_salt = s_post.withColumn(
        "salt", F.pmod(F.xxhash64("src"), F.lit(S)).cast("int")
    )
    t_salt = t_post.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))
    )
    salted = s_salt.join(t_salt, ["token", "salt"]).select("src", "tgt")

    results = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["unsalted_aqe_skew_on"] = t(unsalted)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["unsalted_aqe_skew_off"] = t(unsalted)
    results["salted"] = t(salted)
    # AQE partition coalescing sees only the (tiny) pre-join shuffle bytes
    # and can merge the salted partitions back into few tasks — the row
    # explosion happens inside the join, invisible to its size heuristics
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    results["salted_no_aqe_coalesce"] = t(salted)
    results["unsalted_no_aqe_coalesce"] = t(unsalted)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    n_pairs = blocking_join(src, tgt, cfg).count()
    results_sorted = dict(sorted(results.items(), key=lambda kv: kv[1]))
    print(
        json.dumps(
            {
                "metric": f"skew_blocking_join_local[{cpus}]",
                "pairs": n_pairs,
                "sec": results,
                "ranking": list(results_sorted),
            }
        )
    )


if __name__ == "__main__":
    main()
