"""Corpus-scale recall evaluation of relation extraction vs planted gold.

The mention stage has `tools/eval_mentions_scale.py`; this is the same
instrument for the north rule's *triple extraction* proper: the fixture
generator plants a two-mention relation sentence ("X is a Y" / "X is
part of Y" / "X located in Y") on ~half the multi-mention pages, and
``fixtures.synth_gold_relations_distributed`` replays the per-page-id rng
(head + relation draw) to emit the exact (url, subj, pred, obj) triples
planted — no driver-side corpus, no driver-side gold.

Expected results, and what each one evidences:

* recall vs planted gold ~= 1.0, with EVERY miss attributable to label
  shadowing: the first-occurrence matching contract (documented in
  operators/relations.py) cannot see B when B's label is a whole-token
  subphrase of A's label (its first occurrence sits inside A's surface
  span), or when two URIs share one label (identical positions). The
  tool verifies this attribution row by row — `unexplained_misses` must
  be 0 — so effective recall on non-shadowed gold is exactly 1.0.
* extra (non-gold) typed triples exist BY CONSTRUCTION: fixture labels
  share a small vocabulary, so nested/ambiguous surfaces inside a
  planted relation sentence yield additional well-formed triples (a real
  occurrence of the other concept's surface in the same pattern).
  Reported for transparency; a distant-supervision consumer filters
  these with support counts / NPMI (relation_confidence).

Usage::

    SPARK_GRAFT_CPUS=32 python tools/eval_relations_scale.py --pages 400000

Prints ONE JSON line. Reuses the bench corpus cache when the page count
matches one (same generator, same seed).
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

from bench import (  # noqa: E402  — ONE corpus recipe, shared with the cache
    CORPUS_ONTOLOGY,
    CORPUS_PAGE_KW,
    CORPUS_SEED,
    corpus_cache_dir,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontology_mapping_spark.fixtures import (
        fixture_dataframes,
        make_fixture,
        synth_gold_relations_distributed,
        synth_pages_distributed,
    )
    from ontology_mapping_spark.operators.labels import extract_labels
    from ontology_mapping_spark.operators.mentions import label_phrases
    from ontology_mapping_spark.operators.relations import (
        fold_sentence,
        sentence_mentions,
        split_sentences,
        typed_relation_rows,
    )
    from ontology_mapping_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "eval_relations_scale",
        parallelism=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    fx = make_fixture(n_pages=0, seed=CORPUS_SEED, **CORPUS_ONTOLOGY)
    triples, _, _, _ = fixture_dataframes(spark, fx)
    phrases = label_phrases(extract_labels(triples)).select(
        "uri", fold_sentence("phrase").alias("phrase")
    )

    cache = corpus_cache_dir(args.pages)
    if os.path.exists(os.path.join(cache, "_SUCCESS_ALL")):
        pages = spark.read.parquet(f"{cache}/pages")
    else:
        pages = synth_pages_distributed(
            spark, args.pages, fx.pref_labels, seed=CORPUS_SEED, **CORPUS_PAGE_KW
        )
    pages = pages.filter(F.col("lang") == "en").select("url", "text")
    gold = synth_gold_relations_distributed(
        spark, args.pages, fx.pref_labels, seed=CORPUS_SEED, **CORPUS_PAGE_KW
    )

    t0 = time.time()
    detected = typed_relation_rows(
        sentence_mentions(split_sentences(pages), phrases)
    ).select("url", "subj", "pred", "obj").distinct()
    key = ["url", "subj", "pred", "obj"]
    j = gold.withColumn("g", F.lit(1)).join(
        detected.withColumn("d", F.lit(1)), key, "full_outer"
    )
    agg = j.agg(
        F.count(F.when(F.col("g").isNotNull() & F.col("d").isNotNull(), 1)).alias("matched"),
        F.count(F.when(F.col("g").isNotNull() & F.col("d").isNull(), 1)).alias("missed"),
        F.count(F.when(F.col("g").isNull() & F.col("d").isNotNull(), 1)).alias("extra"),
    ).collect()[0]
    wall = time.time() - t0

    # attribute every miss to label shadowing (the documented
    # first-occurrence contract), using the FOLDED labels the matcher
    # sees — the engine fold is [^a-z0-9]+ -> space (greek decorations
    # fold away; a Unicode isalnum() twin would wrongly keep them)
    import re

    folded = {
        u: re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", lbl.lower())).strip()
        for u, lbl in fx.pref_labels.items()
    }
    missed_rows = (
        j.filter(F.col("g").isNotNull() & F.col("d").isNull())
        .select("subj", "obj")
        .collect()
    )
    unexplained = 0
    for r in missed_rows:
        a, b = folded[r["subj"]], folded[r["obj"]]
        # padded containment covers equality, prefix, suffix and interior
        # whole-token subphrase — every way B's first occurrence can land
        # inside A's surface span
        if f" {b} " not in f" {a} ":
            unexplained += 1
    matched, missed, extra = agg["matched"], agg["missed"], agg["extra"]
    n_gold = matched + missed
    print(
        json.dumps(
            {
                "metric": "relation_recall_vs_planted_gold",
                "pages": args.pages,
                "gold_triples": n_gold,
                "matched": matched,
                "missed": missed,
                "unexplained_misses": unexplained,
                "recall": round(matched / n_gold, 6) if n_gold else None,
                "extra_detected": extra,
                "wall_sec": round(wall, 2),
                "pages_per_sec": round(args.pages / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
