"""Corpus-scale P/R evaluation of the mention-detection stage.

The north-star metric (BASELINE.json: "triple P/R vs reference >= 0.95")
was previously evidenced at 20k pages (the e2e submit_pipeline run in
BENCH.md); this tool measures the mention stage against PLANTED ground
truth at millions of pages, which the distributed fixture twins make
affordable: ``synth_pages_distributed`` generates the corpus on the
executors and ``synth_gold_mentions_distributed`` replays the same
per-page-id rng to emit the exact (url, uri) pairs that were planted —
no driver-side corpus, no driver-side gold.

Expected results, and what each one evidences:

* recall vs planted gold = 1.0 exactly — every planted label phrase is
  found by the fused C extract+scan pipeline (detection misses nothing).
* precision < 1.0 BY CONSTRUCTION — fixture labels are sampled from a
  small vocabulary, so a phrase planted for concept A can equal concept
  B's label/synonym; the scanner (correctly) reports both. Every
  "false positive" is a real occurrence of the other concept's surface;
  the reference's matcher behaves identically on identical surfaces.
  Reported for transparency, not as a target.

Usage::

    SPARK_GRAFT_CPUS=32 python tools/eval_mentions_scale.py --pages 2400000

Prints ONE JSON line. Reuses the bench corpus cache when the page count
matches one (same generator, same seed), so a bench run and this tool
share the one-off corpus build.
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
os.environ.setdefault("PYTHONPATH", _REPO)

# corpus recipe imported from bench.py — ONE source of truth, so the
# cached corpus and the replayed gold can never drift apart
from bench import (  # noqa: E402
    CORPUS_ONTOLOGY,
    CORPUS_PAGE_KW,
    CORPUS_SEED,
    corpus_cache_dir,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_400_000)
    ap.add_argument("--kernel", default=os.environ.get("SPARK_GRAFT_PAGES_KERNEL", "auto"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontology_mapping_spark.fixtures import (
        fixture_dataframes,
        make_fixture,
        synth_gold_mentions_distributed,
        synth_pages_distributed,
    )
    from ontology_mapping_spark.operators.labels import extract_labels
    from ontology_mapping_spark.operators.mentions import (
        label_phrases,
        mentions_from_html,
    )
    from ontology_mapping_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "eval_mentions_scale",
        parallelism=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    fx = make_fixture(n_pages=0, seed=CORPUS_SEED, **CORPUS_ONTOLOGY)
    triples, _, _, _ = fixture_dataframes(spark, fx)
    phrases = label_phrases(extract_labels(triples))

    cache = corpus_cache_dir(args.pages)
    if os.path.exists(os.path.join(cache, "_SUCCESS_ALL")):
        pages = spark.read.parquet(f"{cache}/pages")
    else:
        pages = synth_pages_distributed(
            spark,
            args.pages,
            fx.pref_labels,
            seed=CORPUS_SEED,
            **CORPUS_PAGE_KW,
        )
    gold = synth_gold_mentions_distributed(
        spark,
        args.pages,
        fx.pref_labels,
        seed=CORPUS_SEED,
        **CORPUS_PAGE_KW,
    ).distinct()

    t0 = time.time()
    detected = (
        mentions_from_html(pages, phrases, kernel=args.kernel)
        .select("url", "uri")
        .distinct()
    )
    # one joined pass for all three counts (the win is a single action,
    # not avoiding the shuffle — the full outer join shuffles both sides
    # on the pair key), then conditional counts (gold-only = missed, both =
    # matched, detected-only = extra)
    j = gold.withColumn("g", F.lit(1)).join(
        detected.withColumn("d", F.lit(1)), ["url", "uri"], "full_outer"
    )
    agg = j.agg(
        F.count(F.when(F.col("g").isNotNull() & F.col("d").isNotNull(), 1)).alias("matched"),
        F.count(F.when(F.col("g").isNotNull() & F.col("d").isNull(), 1)).alias("missed"),
        F.count(F.when(F.col("g").isNull() & F.col("d").isNotNull(), 1)).alias("extra"),
    ).collect()[0]
    wall = time.time() - t0
    n_pages = args.pages
    matched, missed, extra = agg["matched"], agg["missed"], agg["extra"]
    n_gold, n_det = matched + missed, matched + extra
    print(
        json.dumps(
            {
                "metric": f"mention_recall_at_scale_local[{cpus}]",
                "pages": n_pages,
                "gold_pairs": n_gold,
                "detected_pairs": n_det,
                "matched": matched,
                "missed": missed,
                "recall_vs_planted": round(matched / n_gold, 6) if n_gold else None,
                "precision_vs_planted": round(matched / n_det, 6) if n_det else None,
                "kernel": args.kernel,
                "wall_sec": round(wall, 2),
                "pages_per_sec": round(n_pages / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
