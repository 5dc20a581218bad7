"""Ingest crawl shards into the engine's partitioned pages table — the
S0 command line (``sources/warc.ingest_warc`` as a tool).

Reads every ``.warc`` / ``.warc.gz`` under ``--warc`` (one Spark task
per shard), keeps real pages (HTTP 200 ``text/html`` with a target URI
by default — knobs below), extracts text with the golden extractor,
language-IDs it, and writes the ``(lang, p_date)``-partitioned parquet
layout the whole pipeline reads through (``readers.read_pages``, scan
pruning pinned by test). WET shards (pre-extracted text) ingest with
``--record-types conversion --no-status-filter --no-type-filter``.

Examples::

    python tools/ingest_warc.py --warc crawl/segments --out out/web_pages

    python tools/ingest_warc.py --warc wet/ --out out/web_pages \\
        --record-types conversion --no-status-filter --no-type-filter \\
        --lax

    python tools/ingest_warc.py --warc wat/ --out out/links --wat

``--wat`` switches to the metadata lane: shards are read through
``read_wat`` and the RESOLVED link rows (``url, href, anchor,
dst_url`` — exactly ``extract_links``'s shape) land as plain parquet,
ready for the link-graph family; the page-filter knobs don't apply.

Everything here is argument plumbing — the work is the same
scan → parse → filter → extract → langid → partitioned-write pass a
library caller gets from ``ingest_warc``.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser(
        description="WARC/WET shards -> lang/date-partitioned web_pages parquet"
    )
    ap.add_argument("--warc", required=True, help="shard directory (or glob)")
    ap.add_argument("--out", required=True, help="pages table output path")
    ap.add_argument(
        "--record-types", nargs="+", default=["response"],
        help="WARC-Type values to keep (default: response; WET: conversion)",
    )
    ap.add_argument(
        "--statuses", nargs="+", type=int, default=[200],
        help="HTTP statuses to keep (default: 200)",
    )
    ap.add_argument(
        "--no-status-filter", action="store_true",
        help="keep every status (required for WET records: status is NULL)",
    )
    ap.add_argument(
        "--content-types", nargs="+", default=["text/html"],
        help="Content-Type prefixes to keep (missing Content-Type passes)",
    )
    ap.add_argument(
        "--no-type-filter", action="store_true",
        help="keep every content type",
    )
    ap.add_argument(
        "--lax", action="store_true",
        help="skip malformed shards/records instead of raising (default: "
        "strict — the first malformed record fails the run, named)",
    )
    ap.add_argument("--mode", default="overwrite", choices=["overwrite", "append"])
    ap.add_argument(
        "--files-per-partition", type=int, default=1,
        help="writer tasks per (lang, day) partition (raise when one day "
        "of one language exceeds a single task's output)",
    )
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
    )
    ap.add_argument(
        "--wat", action="store_true",
        help="ingest WAT metadata shards instead: resolved link rows "
        "(url, href, anchor, dst_url) -> plain parquet at --out",
    )
    args = ap.parse_args()

    from ontology_mapping_spark.session import get_spark
    from ontology_mapping_spark.sources.warc import ingest_warc

    spark = get_spark(
        "ingest_warc", parallelism=args.cpus, shuffle_partitions=args.cpus
    )
    if args.wat:
        from ontology_mapping_spark.sources.warc import read_wat, wat_links

        links = wat_links(read_wat(spark, args.warc, strict=not args.lax))
        links.write.mode(args.mode).parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"wrote {n} links to {args.out}")
        spark.stop()
        return
    ingest_warc(
        spark,
        args.warc,
        args.out,
        record_types=tuple(args.record_types),
        strict=not args.lax,
        mode=args.mode,
        files_per_partition=args.files_per_partition,
        statuses=None if args.no_status_filter else tuple(args.statuses),
        content_type_prefixes=(
            None if args.no_type_filter else tuple(args.content_types)
        ),
    )
    try:
        n = spark.read.parquet(args.out).count()
    except Exception:
        # a zero-row partitioned write leaves no part files, so the
        # readback cannot infer a schema — report the honest count
        # instead of a stack trace (classic cause: WET records without
        # --no-status-filter, every NULL status dropped by the 200 gate)
        n = 0
    print(f"wrote {n} pages to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
