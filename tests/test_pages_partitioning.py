"""Partition-pruning evidence for the 100 TB web_pages scan (VERDICT r3 #7).

The north rule's pages table is lang/date-partitioned Iceberg; the sandbox
stand-in is partitioned parquet (same pruning machinery in Spark's file
source). Pinned here: a lang-filtered read lists and scans ONLY the lang's
files (input_file_name at execution time), and the physical plan carries
the predicate as a PartitionFilter, not a post-scan Filter.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ontology_mapping_spark.fixtures import fixture_dataframes, make_fixture
from ontology_mapping_spark.sources.readers import read_pages, write_pages_partitioned


def _scanned_files(df) -> set[str]:
    """Files actually opened at execution time — reflects pruning exactly."""
    return {
        r["f"]
        for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    }


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_lang_filtered_scan_prunes_partitions(spark, tmp_path):
    fx = make_fixture(n_pairs=12, n_extra_per_side=6, n_pages=120)
    _, _, _, pages = fixture_dataframes(spark, fx)
    langs = {r["lang"] for r in pages.select("lang").distinct().collect()}
    assert langs == {"en", "de"}  # fixture plants ~5% de pages

    path = str(tmp_path / "web_pages")
    write_pages_partitioned(pages, path)

    # round-trip: full read returns the exact input rows, input_hint order
    full = read_pages(spark, path)
    assert full.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert sorted(r["url"] for r in full.collect()) == sorted(
        r["url"] for r in pages.collect()
    )

    all_files = _scanned_files(full)
    assert any("/lang=de/" in f for f in all_files)

    # the pruning claim: a lang=en read never opens a lang=de file
    en = read_pages(spark, path, lang="en")
    en_files = _scanned_files(en)
    assert en_files and all("/lang=en/" in f for f in en_files)
    assert len(en_files) < len(all_files)
    assert en.count() == pages.filter(F.col("lang") == "en").count()

    # and the plan shows it as a PartitionFilter (pruned at listing time,
    # before any IO), not a post-scan data Filter
    plan = _plan_of(en)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "lang" in pf[0], plan


def test_date_range_prunes_day_partitions(spark, tmp_path):
    fx = make_fixture(n_pairs=8, n_extra_per_side=4, n_pages=60)
    _, _, _, pages = fixture_dataframes(spark, fx)
    # the fixture crawls within one day; spread rows across 3 days
    # deterministically to exercise day-partition pruning
    pages = pages.withColumn(
        "warc_ts",
        F.expr("timestampadd(DAY, CAST(pmod(xxhash64(url), 3) AS INT), warc_ts)"),
    )
    days = sorted(
        r["d"] for r in pages.select(F.to_date("warc_ts").alias("d")).distinct().collect()
    )
    assert len(days) >= 2, "fixture must span several crawl days"

    path = str(tmp_path / "web_pages")
    write_pages_partitioned(pages, path)

    lo = str(days[0])
    one_day = read_pages(spark, path, start_date=lo, end_date=lo)
    day_files = _scanned_files(one_day)
    assert day_files and all(f"/p_date={lo}/" in f for f in day_files)
    assert one_day.count() == pages.filter(F.to_date("warc_ts") == F.lit(lo)).count()

    plan = _plan_of(one_day)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "p_date" in pf[0], plan


def test_writer_task_layout_no_tiny_files(spark, tmp_path):
    """The pre-write repartition gives each (lang, day) exactly one file
    (files_per_partition=1) — the anti-small-files layout contract."""
    fx = make_fixture(n_pairs=8, n_extra_per_side=4, n_pages=80)
    _, _, _, pages = fixture_dataframes(spark, fx)
    path = str(tmp_path / "web_pages")
    write_pages_partitioned(pages, path)
    files = _scanned_files(read_pages(spark, path))
    parts = {f.rsplit("/", 1)[0] for f in files}
    assert len(files) == len(parts), "one parquet file per (lang, day) partition"


def test_constant_graph_quad_pattern_prunes_partitions(spark, tmp_path):
    """A quad store partitioned by graph (asserted-vs-entailed layers, one
    named graph per crawl) must let a constant-graph BGP pattern prune to
    that graph's files — the scale claim in kgquery's GRAPH docs."""
    from ontology_mapping_spark.operators.kgquery import bgp_match

    rows = [
        ("g1", "b", "broader", "a"),
        ("g1", "a", "label", "root"),
        ("g2", "d", "broader", "b"),
        ("g2", "a", "label", "wurzel"),
        ("g3", "e", "broader", "d"),
    ]
    quads = spark.createDataFrame(
        rows, "graph string, subject string, predicate string, object string"
    )
    path = str(tmp_path / "kg_quads")
    quads.write.partitionBy("graph").parquet(path)

    stored = spark.read.parquet(path)
    scoped = bgp_match(stored, [("g1", "?x", "?p", "?o")])
    files = _scanned_files(scoped)
    assert files and all("/graph=g1/" in f for f in files)
    assert scoped.count() == 2

    plan = _plan_of(scoped)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "graph" in pf[0], plan
    # a variable graph term reads every partition (union-of-graphs)
    assert bgp_match(stored, [("?g", "?x", "broader", "?o")]).count() == 3
