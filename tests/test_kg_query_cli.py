"""tools/kg_query.py: the SPARQL command line over a KG on disk."""

from __future__ import annotations

import sys

import pytest


@pytest.fixture(scope="module")
def kg_paths(spark, tmp_path_factory):
    from ontology_mapping_spark.sources.rdf import write_ntriples

    base = tmp_path_factory.mktemp("kgq")
    kg = spark.createDataFrame(
        [
            ("b", "broader", "a"),
            ("c", "broader", "a"),
            ("a", "label", "root"),
            ("d", "deprecated", "x"),
        ],
        "subject string, predicate string, object string",
    )
    pq = str(base / "triples")
    nt = str(base / "dump.nt")
    kg.write.mode("overwrite").parquet(pq)
    write_ntriples(kg, nt)
    return base, pq, nt


def _run(argv):
    sys.path.insert(0, "/root/repo/tools")
    try:
        import kg_query
    finally:
        sys.path.pop(0)
    kg_query.main(argv)


def test_cli_select_prints(kg_paths, capsys):
    _base, pq, _nt = kg_paths
    _run(
        [
            "--triples", pq, "--cpus", "4",
            "--query",
            "SELECT ?y (COUNT(*) AS ?n) WHERE { ?x broader ?y . } GROUP BY ?y",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "y\tn"
    assert "a\t2" in out


def test_cli_update_roundtrip(kg_paths, spark, capsys):
    from ontology_mapping_spark.sources.rdf import read_ntriples

    base, _pq, nt = kg_paths
    out_dir = str(base / "v2")
    _run(
        [
            "--ntriples", nt, "--cpus", "4",
            "--update", "DELETE WHERE { ?x deprecated ?y . }",
            "--out", out_dir, "--format", "ntriples",
        ]
    )
    back = read_ntriples(spark, out_dir)
    preds = {r["predicate"] for r in back.collect()}
    assert preds == {"broader", "label"}


def test_cli_nquads_graph_query_and_export(kg_paths, spark, capsys):
    """--nquads ingest binds the graph column (GRAPH patterns work on the
    ingested table) and --format nquads exports a quad-shaped result."""
    from ontology_mapping_spark.sources.rdf import read_nquads, write_nquads

    base, _pq, _nt = kg_paths
    quads = spark.createDataFrame(
        [
            ("g1", "b", "broader", "a"),
            ("g2", "c", "broader", "a"),
            (None, "a", "label", "root"),
        ],
        "graph string, subject string, predicate string, object string",
    )
    nq = str(base / "dump.nq")
    write_nquads(quads, nq)
    _run(
        [
            "--nquads", nq, "--cpus", "4",
            "--query", "SELECT ?x WHERE { GRAPH g1 { ?x broader ?y . } }",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "x" and out[1:] == ["b"]
    # quad-shaped export round-trips, NULL (default-graph) row included
    out_dir = str(base / "nq_copy")
    _run(
        [
            "--nquads", nq, "--cpus", "4",
            "--query",
            "SELECT ?g ?s ?p ?o WHERE { GRAPH ?g { ?s ?p ?o . } }",
            "--out", out_dir, "--format", "parquet",
        ]
    )
    got = spark.read.parquet(out_dir)
    assert got.count() == 2  # named-graph rows bind ?g; NULL graph doesn't
    back = read_nquads(spark, nq)
    key = lambda r: tuple("" if v is None else v for v in r)
    assert sorted((tuple(r) for r in back.collect()), key=key) == sorted(
        (tuple(r) for r in quads.collect()), key=key
    )
