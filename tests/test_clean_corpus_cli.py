"""tools/clean_corpus.py: the staged cleaning plan as a command line."""

from __future__ import annotations

import json
import sys


def _run(argv, capsys):
    sys.path.insert(0, "/root/repo/tools")
    try:
        import clean_corpus
    finally:
        sys.path.pop(0)
    clean_corpus.main(argv)
    lines = [
        l for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    return json.loads(lines[-1])


def test_cli_cleans_and_resumes(spark, tmp_path, capsys):
    good = (
        "the quick brown fox jumped over the lazy dog and it was a fine "
        "day for all of the animals in the field that we observed there"
    )
    rows = [
        ("d1", good + " one", "http://a.example/p"),
        ("d2", good + " one", "http://a.example/p#frag"),  # url-dup of d1
        ("d3", good + " two", "http://a.example/q"),
        ("d4", good + " two", "http://b.example/r"),       # exact dup of d3
        ("d5", "zzz " * 3, "http://c.example/s"),          # quality drop
    ]
    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id string, text string, url string"
    ).write.parquet(docs)
    wd = str(tmp_path / "clean")
    out = _run(
        ["--docs", docs, "--workdir", wd, "--url-col", "url",
         "--near-dup-threshold", "0.99"],
        capsys,
    )
    assert out["input_rows"] == 5
    # d2 drops at url dedup (fragment strips to the same canonical url),
    # d5 at quality, d4 at exact dedup
    assert out["stages"]["clean_url_dedup"] == 4
    assert out["stages"]["clean_quality"] == 3
    assert out["stages"]["clean_exact_dedup"] == 2
    assert out["clean_rows"] == 2
    assert out["resumed_stages"] == []
    kept = {
        r.doc_id
        for r in spark.read.parquet(out["clean_path"]).collect()
    }
    assert kept == {"d1", "d3"}
    # identical re-run resumes every stage
    out2 = _run(
        ["--docs", docs, "--workdir", wd, "--url-col", "url",
         "--near-dup-threshold", "0.99"],
        capsys,
    )
    assert set(out2["resumed_stages"]) == {
        "clean_url_dedup", "clean_quality", "clean_exact_dedup",
        "clean_near_dup",
    }
    assert out2["clean_rows"] == 2
