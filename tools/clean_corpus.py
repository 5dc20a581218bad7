"""Training-corpus cleaning as a resumable command line —
``plans/cleaning.clean_corpus_staged`` as a tool.

Reads a documents parquet (``doc_id``, ``text``, optionally a url
column), runs the staged cleaning plan (url dedup -> quality verdicts ->
[line dedup] -> exact dedup -> MinHash-LSH near-dup removal ->
[decontamination vs an eval parquet]), every stage landing through
``StageRunner`` in ``--workdir`` — a killed run resumes at the last
completed boundary, a re-run skips everything, any knob change
invalidates the chain. Prints ONE JSON line: per-stage row counts (from
the stage manifests — no extra corpus passes) + resumed stages; the
final cleaned table is the last stage's output directory.

Examples::

    python tools/clean_corpus.py --docs data/documents --workdir out/clean

    python tools/clean_corpus.py --docs data/documents --workdir out/clean \\
        --url-col url --line-dedup --eval data/eval_benchmarks
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description="documents parquet -> staged, resumable cleaning plan"
    )
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--workdir", required=True, help="stage outputs + manifests")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument(
        "--url-col", default=None,
        help="enable URL-keyed dedup on this column (cheapest first pass)",
    )
    ap.add_argument(
        "--eval", default=None,
        help="eval-set parquet: append 13-gram decontamination as the "
        "final stage",
    )
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--min-distinct-frac", type=float, default=0.3)
    ap.add_argument("--max-top-bigram-frac", type=float, default=0.2)
    ap.add_argument("--min-stopword-ratio", type=float, default=0.01)
    ap.add_argument("--min-alpha-ratio", type=float, default=0.5)
    ap.add_argument("--near-dup-threshold", type=float, default=0.7)
    ap.add_argument("--minhash-num-hashes", type=int, default=16)
    ap.add_argument("--minhash-bands", type=int, default=8)
    ap.add_argument(
        "--line-dedup", action="store_true",
        help="C4-style corpus-wide duplicate-line removal (rewrites text "
        "— downstream byte-identity contracts must opt in knowingly)",
    )
    ap.add_argument("--line-dedup-min-chars", type=int, default=10)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ontology_mapping_spark.plans.cleaning import (
        CleaningConfig,
        clean_corpus_staged,
    )
    from ontology_mapping_spark.session import get_spark

    active = SparkSession.getActiveSession()
    owns_session = active is None
    spark = (
        get_spark(
            "clean_corpus", parallelism=args.cpus, shuffle_partitions=args.cpus
        )
        if owns_session
        else active
    )
    cfg = CleaningConfig(
        lang=args.lang,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        min_distinct_frac=args.min_distinct_frac,
        max_top_bigram_frac=args.max_top_bigram_frac,
        min_stopword_ratio=args.min_stopword_ratio,
        min_alpha_ratio=args.min_alpha_ratio,
        near_dup_threshold=args.near_dup_threshold,
        minhash_num_hashes=args.minhash_num_hashes,
        minhash_bands=args.minhash_bands,
        line_dedup=args.line_dedup,
        line_dedup_min_chars=args.line_dedup_min_chars,
    )
    docs = spark.read.parquet(args.docs)
    eval_df = spark.read.parquet(args.eval) if args.eval else None
    clean, metrics, runner = clean_corpus_staged(
        spark,
        args.workdir,
        docs,
        cfg,
        text_col=args.text_col,
        id_col=args.id_col,
        url_col=args.url_col,
        eval_df=eval_df,
    )
    stages = {r["stage"]: int(r["rows"]) for r in metrics.collect()}
    last_stage = list(stages)[-1]
    print(
        json.dumps(
            {
                "workdir": args.workdir,
                "input_rows": docs.count(),
                "stages": stages,
                "clean_rows": stages[last_stage],
                "clean_path": os.path.join(args.workdir, last_stage),
                "resumed_stages": sorted(
                    s for s, ev in runner.events if ev == "skipped"
                ),
            }
        )
    )
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
