"""spark-submit entry point for the end-to-end KG-construction pipeline.

The north-rule deployment shape (BASELINE.json: "run via spark-submit
--py-files on a multi-executor cluster") — this script never sets a master,
so the cluster manager / --master flag of spark-submit decides where it
runs; locally it degrades to ``python tools/submit_pipeline.py`` (env
SPARK_GRAFT_CPUS picks the local parallelism).

Typical cluster invocation::

    python tools/submit_pipeline.py --build-zip          # once: package
    spark-submit --master <cluster> \
        --py-files build/ontology_mapping_spark.zip \
        tools/submit_pipeline.py --workdir hdfs://.../kg_run1 \
        [--pages /path/to/web_pages_parquet] [--triples /path/to/triples]

With no --pages/--triples it synthesizes the deterministic fixture corpus
(same generator the tests pin), so the same command validates a fresh
cluster end-to-end. The workdir gives checkpoint/resume: re-running with
the same workdir + config skips completed stages (StageRunner manifests).

Prints ONE JSON line: stage row counts, match-class precision/recall, and
wall seconds — the per-cluster-size observable for the scaling-efficiency
criterion (run at N and 4N executors, compare pages/sec).
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


def build_zip() -> str:
    """Package the library for --py-files (the import root must be the zip
    root, so workers can ``import ontology_mapping_spark``)."""
    import zipfile

    out_dir = os.path.join(_REPO, "build")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "ontology_mapping_spark.zip")
    pkg = os.path.join(_REPO, "ontology_mapping_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, _REPO))
    return out


def update_kg_state(
    spark, state_path: str, triples, crawl_ts, buckets: int | None = None
) -> int:
    """Merge one crawl's (subject, predicate, object) triples into the
    provenance-carrying KG state table at ``state_path``.

    Every triple of this crawl is stamped with ``crawl_ts`` (the crawl is
    the observation) and upserted via ``operators.kgmaint.merge_triples``:
    first crawl creates the table, later crawls extend ``last_seen`` and
    accumulate ``support``. Returns the merged row count.

    Thin wrapper over ``kgmaint.upsert_observations`` (which owns the
    materialize-then-swap discipline) stamping one constant crawl ts.
    """
    from pyspark.sql import functions as F

    from ontology_mapping_spark.operators.kgmaint import upsert_observations

    # fail fast on an unparsable timestamp: a silent NULL here would stamp
    # every observation with first_seen/last_seen = NULL, provenance the
    # least/greatest merge can never repair afterwards
    ts_lit = F.lit(str(crawl_ts)).cast("timestamp")
    if spark.range(1).select(ts_lit.alias("ts")).first()[0] is None:
        raise ValueError(
            f"crawl_ts {crawl_ts!r} does not parse as a timestamp "
            "(pass --crawl-ts in ISO form, e.g. 2024-02-01T00:00:00)"
        )
    delta = triples.select(
        "subject",
        "predicate",
        "object",
        ts_lit.alias("ts"),
    )
    # the crawl records itself in the state's atomic commit marker (the
    # same _commit.json the streaming sink uses for its batch id), and
    # the crawl timestamp IS the batch id: a crashed driver loop that
    # re-runs the same crawl's merge is a no-op instead of silently
    # doubling support. ``buckets`` hash-buckets the state by the triple
    # key (sticky once set — later crawls inherit the layout from the
    # marker), so only the crawl-sized delta shuffles on merge.
    return upsert_observations(
        spark,
        state_path,
        delta,
        commit_meta={"crawl_ts": str(crawl_ts)},
        batch_id=f"crawl:{crawl_ts}",
        buckets=buckets,
        # refresh the per-predicate counts in the commit marker each
        # crawl (one bounded aggregate): kgquery/sparql readers pull
        # them via kgmaint.state_predicate_stats for estimated-
        # cardinality join ordering without re-scanning the state
        record_predicate_stats=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-zip", action="store_true", help="package for --py-files and exit")
    ap.add_argument("--workdir", default=os.path.join(_REPO, ".pipeline_work"))
    ap.add_argument("--pages", default=None, help="parquet path of web_pages (url, warc_ts, html, text, lang)")
    ap.add_argument("--triples", default=None, help="parquet path of ontology triples (subject, predicate, object, lang)")
    ap.add_argument("--align-train", dest="align_train", default=None)
    ap.add_argument("--align-test", dest="align_test", default=None)
    ap.add_argument("--fixture-pages", type=int, default=2000, help="synthetic corpus size when no --pages given")
    ap.add_argument("--fixture-pairs", type=int, default=60)
    ap.add_argument(
        "--ntriples-out",
        default=None,
        help="also serialize kg_triples as N-Triples text to this path",
    )
    ap.add_argument(
        "--kg-state",
        default=None,
        help="provenance-carrying KG state table (parquet dir): merge this "
        "crawl's triples in (first_seen/last_seen/support upsert); created "
        "on first run, previous state kept at <path>.prev",
    )
    ap.add_argument(
        "--crawl-ts",
        default=None,
        help="observation timestamp for --kg-state (ISO); default: the "
        "input corpus's max warc_ts",
    )
    ap.add_argument(
        "--kg-state-buckets",
        type=int,
        default=None,
        help="hash-bucket the --kg-state table by (subject, predicate, "
        "object) into N buckets so later merges shuffle only the delta; "
        "sticky: once set, later runs inherit it from the commit marker",
    )
    ap.add_argument(
        "--entail",
        action="store_true",
        help="materialize the RDFS-style entailment layer (sameAs "
        "symmetry, mention lifting across sameAs, subClassOf "
        "transitivity) over kg_triples ∪ ontology as a resumable "
        "'entailment' stage (derived triples only, kept separate from "
        "the asserted graph)",
    )
    args = ap.parse_args()

    if args.build_zip:
        print(json.dumps({"zip": build_zip()}))
        return

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("ontology_mapping_spark.pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # under spark-submit the JVM gateway already exists (PythonRunner
    # exports PYSPARK_GATEWAY_PORT to the python driver) and the master
    # arrives as the spark.master system property — never override it;
    # standalone python runs fall back to a local master sized by
    # SPARK_GRAFT_CPUS
    launched_by_spark_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if not launched_by_spark_submit and not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
        builder = (
            builder.master(f"local[{cpus}]")
            .config("spark.sql.shuffle.partitions", str(max(int(cpus), 4)))
            # local mode runs driver+executors in ONE JVM whose default
            # heap is 1g — OOMs on a >=100k-page fixture; under
            # spark-submit the cluster config owns memory and this branch
            # never runs
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            )
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ontology_mapping_spark.plans.pipeline import run_pipeline

    t0 = time.time()
    if bool(args.pages) != bool(args.triples):
        ap.error("--pages and --triples must be given together")
    if args.pages and args.triples:
        pages = spark.read.parquet(args.pages)
        triples = spark.read.parquet(args.triples)
        if not (args.align_train and args.align_test):
            ap.error("--align-train/--align-test required with --triples")
        from ontology_mapping_spark.sources.readers import read_alignments

        align_train = read_alignments(spark, args.align_train)
        align_test = read_alignments(spark, args.align_test)
    else:
        from ontology_mapping_spark.fixtures import fixture_dataframes, make_fixture

        # pages above this size are generated ON THE EXECUTORS (per-page-id
        # rng, byte-deterministic at any parallelism) — the driver-side
        # loop is O(corpus) single-core Python and stops being viable
        # around ~100k pages; the ontology/alignments are small and stay
        # driver-side either way
        big = args.fixture_pages > 20_000
        fx = make_fixture(
            n_pairs=args.fixture_pairs,
            n_extra_per_side=args.fixture_pairs // 3,
            n_pages=0 if big else args.fixture_pages,
        )
        triples, align_train, align_test, pages = fixture_dataframes(spark, fx)
        if big:
            from ontology_mapping_spark.fixtures import synth_pages_distributed

            pages = synth_pages_distributed(
                spark, args.fixture_pages, fx.pref_labels, seed=42
            )

    res = run_pipeline(spark, triples, align_train, align_test, pages, args.workdir)
    if args.ntriples_out:
        from ontology_mapping_spark.sources.rdf import write_ntriples

        write_ntriples(res.triples, args.ntriples_out)
    kg_state_rows = None
    if args.kg_state:
        from pyspark.sql import functions as F

        crawl_ts = args.crawl_ts
        if crawl_ts is None:
            max_ts = pages.agg(F.max("warc_ts")).first()[0]
            if max_ts is None:
                raise SystemExit(
                    "--kg-state needs an observation timestamp, but the "
                    "corpus has no non-null warc_ts; pass --crawl-ts"
                )
            crawl_ts = str(max_ts)
        kg_state_rows = update_kg_state(
            spark, args.kg_state, res.triples, crawl_ts,
            buckets=args.kg_state_buckets,
        )
    entailed_rows = None
    if args.entail:
        from ontology_mapping_spark.operators.kginfer import (
            entailed_triples,
            kg_entailment_rules,
        )

        rules = kg_entailment_rules(res.runner.cfg.predicates)
        asserted = res.triples.unionByName(
            triples.select("subject", "predicate", "object")
        )
        ent = res.runner.materialize(
            "entailment",
            lambda: entailed_triples(asserted, rules),
            ["kg_triples"],
        )
        entailed_rows = ent.count()
    n_triples = res.triples.count()
    n_pages = pages.count()
    report = {
        r["class"]: {"precision": r["precision"], "recall": r["recall"]}
        for r in res.report.collect()
        if r["class"] in ("0", "1")
    }
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "kg_triples": n_triples,
                "pages": n_pages,
                "match_class": report.get("1", {}),
                "wall_sec": round(wall, 2),
                "pages_per_sec": round(n_pages / wall, 1),
                "workdir": args.workdir,
                "master": spark.conf.get("spark.master"),
                "resumed_stages": sorted(
                    s for s, ev in res.runner.events if ev == "skipped"
                ),
                **(
                    {"kg_state_triples": kg_state_rows}
                    if kg_state_rows is not None
                    else {}
                ),
                **(
                    {"entailed_triples": entailed_rows}
                    if entailed_rows is not None
                    else {}
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
