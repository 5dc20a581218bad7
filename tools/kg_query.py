"""Run SPARQL text against a KG on disk — the triple-store face of the
engine as a command line.

Reads the KG from parquet (the engine's native (subject, predicate,
object[, graph]) layout, e.g. a StageRunner/kgmaint output), from an
N-Triples dump (``sources/rdf.read_ntriples`` — the sink's exact
inverse), or from an N-Quads dump (``read_nquads``; the optional fourth
term binds the ``graph`` column, so GRAPH patterns work directly on the
ingested table), compiles the query STRING through ``operators/sparql_text``
into the same distributed plan the algebra builds, and either prints the
first rows or writes the full result out (parquet, or N-Triples when the
result is triple-shaped — CONSTRUCT/DESCRIBE/UPDATE results are).

Examples::

    python tools/kg_query.py --triples out/kg_triples \\
        --query 'SELECT ?y (COUNT(*) AS ?n) WHERE { ?x broader ?y . }
                 GROUP BY ?y ORDER BY DESC(?n) LIMIT 10'

    python tools/kg_query.py --ntriples dump.nt \\
        --query-file q.rq --out result --format parquet

    python tools/kg_query.py --triples out/kg_triples \\
        --update 'DELETE WHERE { ?x deprecated ?y . }' \\
        --out kg_triples_v2 --format ntriples

UPDATE requests return the post-update graph and REQUIRE --out (the
caller owns persistence; write-back through kgmaint/StageRunner keeps
the atomic-swap + lineage story). Everything here is driver-side
argument plumbing — the work is the same lazy plan a library caller
gets.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--triples", help="parquet triple/quad table path")
    src.add_argument("--ntriples", help="N-Triples text path")
    src.add_argument("--nquads", help="N-Quads text path (binds a graph column)")
    q = ap.add_mutually_exclusive_group(required=True)
    q.add_argument("--query", help="SPARQL query string")
    q.add_argument("--query-file", help="file holding the SPARQL query")
    q.add_argument("--update", help="SPARQL UPDATE request string")
    q.add_argument("--update-file", help="file holding the UPDATE request")
    ap.add_argument("--out", help="output directory (write instead of print)")
    ap.add_argument(
        "--format",
        choices=("parquet", "ntriples", "nquads"),
        default="parquet",
        help="output format for --out (ntriples/nquads need a "
        "triple-/quad-shaped result)",
    )
    ap.add_argument("--limit", type=int, default=20, help="print at most N rows")
    ap.add_argument(
        "--stats",
        choices=["auto", "scan", "off"],
        default="auto",
        help="per-predicate counts for estimated-cardinality BGP join "
        "ordering: auto = use the counts recorded in a --triples state's "
        "commit marker when present (kgmaint.state_predicate_stats), "
        "scan = compute them now with one bounded aggregate, off = "
        "legacy most-constants-first ordering",
    )
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ontology_mapping_spark.operators.sparql_text import sparql, sparql_update
    from ontology_mapping_spark.session import get_spark
    from ontology_mapping_spark.sources.rdf import (
        read_ntriples,
        read_nquads,
        write_ntriples,
        write_nquads,
    )

    # an in-process caller (e.g. the tests) already has a session: use
    # it UNTOUCHED — reconfiguring shuffle partitions on a shared
    # session would leak into the caller's plans — and don't stop it
    active = SparkSession.getActiveSession()
    owns_session = active is None
    spark = (
        get_spark(
            "kg_query", parallelism=args.cpus, shuffle_partitions=args.cpus
        )
        if owns_session
        else active
    )
    if args.triples:
        kg = spark.read.parquet(args.triples)
    elif args.nquads:
        kg = read_nquads(spark, args.nquads)
    else:
        kg = read_ntriples(spark, args.ntriples)

    stats = None
    if args.stats == "scan":
        from ontology_mapping_spark.operators.kgquery import predicate_stats

        stats = predicate_stats(kg)
    elif args.stats == "auto" and args.triples:
        from ontology_mapping_spark.operators.kgmaint import (
            state_predicate_stats,
        )

        try:
            stats = state_predicate_stats(args.triples)
        except (OSError, ValueError):
            stats = None

    update_text = args.update or (
        open(args.update_file).read() if args.update_file else None
    )
    if update_text is not None:
        if not args.out:
            ap.error("--update returns the post-update graph; pass --out")
        result = sparql_update(kg, update_text, stats=stats)
    else:
        query_text = args.query or open(args.query_file).read()
        result = sparql(kg, query_text, stats=stats)

    if args.out:
        if args.format == "ntriples":
            if set(result.columns) != {"subject", "predicate", "object"}:
                ap.error(
                    "--format ntriples needs a triple-shaped result "
                    f"(got columns {result.columns}); use CONSTRUCT/"
                    "DESCRIBE/UPDATE or --format parquet"
                )
            write_ntriples(result, args.out)
        elif args.format == "nquads":
            if set(result.columns) != {"graph", "subject", "predicate", "object"}:
                ap.error(
                    "--format nquads needs a quad-shaped result "
                    f"(got columns {result.columns}); query a quad table "
                    "or use --format parquet"
                )
            write_nquads(result, args.out)
        else:
            result.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out} [{args.format}]")
    else:
        rows = result.limit(args.limit + 1).collect()
        print("\t".join(result.columns))
        for r in rows[: args.limit]:
            print("\t".join("" if v is None else str(v) for v in r))
        if len(rows) > args.limit:
            print("... (more rows; raise --limit or use --out)")
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
