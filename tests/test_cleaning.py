"""End-to-end corpus-cleaning composition (plans/cleaning.py): every
stage removes exactly its planted victims, survivors and metrics agree."""

from __future__ import annotations

from ontology_mapping_spark.plans.cleaning import CleaningConfig, clean_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the calm cat "
    "walks along the wide road toward a small town near the old river "
)
# a second long high-quality doc sharing almost no shingles with GOOD
GOOD2 = (
    "every winter morning she would carry fresh bread from the bakery "
    "across three bridges while children skated on the frozen canal below "
)


def test_clean_corpus_stages(spark):
    rows = [
        # survivors: distinct good docs
        (1, GOOD + "first story about the forest", "https://a.com/1"),
        (2, GOOD2 + "second story about the sea", "https://a.com/2"),
        # url duplicate of doc 1 (same canonical url, higher id drops)
        (3, GOOD + "first story about the forest", "https://A.com/1/?utm_source=x"),
        # low quality: too short
        (4, "tiny", "https://a.com/4"),
        # exact content duplicate of doc 2 (different url)
        (5, GOOD2 + "second story about the sea", "https://a.com/5"),
        # near duplicate of doc 1 (suffix tweak)
        (6, GOOD + "first story about the forest indeed", "https://a.com/6"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    clean, metrics = clean_corpus(
        docs, CleaningConfig(near_dup_threshold=0.5), url_col="url"
    )
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    m = {r["stage"]: r["rows"] for r in metrics.collect()}
    assert m == {
        "input": 6,
        "url_dedup": 5,      # 3 dropped (canonical url == doc 1's)
        "quality_keep": 4,   # 4 dropped (too short)
        "exact_dedup": 3,    # 5 dropped (same text as doc 2)
        "near_dup": 2,       # 6 dropped (jaccard vs doc 1 over threshold)
    }
    # schema passes through unchanged (minus nothing)
    assert set(clean.columns) == {"doc_id", "text", "url"}


def test_clean_corpus_line_dedup_strips_chrome_then_unifies_residues(spark):
    """With line_dedup on, shared chrome survives only in its first
    occurrence; pages whose EVERY line is corpus-duplicated reduce to the
    same empty residue, which exact_dedup then unifies — the reason line
    dedup runs BEFORE content dedup."""
    chrome = "SHARED NAVIGATION CHROME LINE ON EVERY PAGE"
    art1 = GOOD + "first unique article body"
    art2 = GOOD2 + "second unique article body"
    rows = [
        (1, chrome + "\n" + art1, "https://a.com/1"),
        (2, chrome + "\n" + art2, "https://b.com/1"),
        # pure re-crawls: every line already seen -> empty residue
        (3, chrome + "\n" + art1, "https://c.com/1"),
        (4, chrome + "\n" + art2, "https://d.com/1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    clean, metrics = clean_corpus(
        docs,
        CleaningConfig(line_dedup=True, near_dup_threshold=0.99),
        url_col="url",
    )
    out = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert sorted(out) == [1, 2, 3]
    assert out[1] == chrome + "\n" + art1  # first doc keeps the chrome
    assert out[2] == art2                  # later docs lose it
    assert out[3] == ""                    # one canonical empty residue
    m = {r["stage"]: r["rows"] for r in metrics.collect()}
    assert m["line_dedup"] == 4   # rewrites text, drops no rows
    assert m["exact_dedup"] == 3  # doc 4's residue == doc 3's -> drops


def test_clean_corpus_staged_resumes_and_matches_unstaged(spark, tmp_path):
    from ontology_mapping_spark.plans.cleaning import clean_corpus_staged

    rows = [
        (1, GOOD + "first story about the forest", "https://a.com/1"),
        (2, GOOD2 + "second story about the sea", "https://a.com/2"),
        (3, GOOD + "first story about the forest", "https://A.com/1/?utm_source=x"),
        (4, "tiny", "https://a.com/4"),
        (5, GOOD2 + "second story about the sea", "https://a.com/5"),
        (6, GOOD + "first story about the forest indeed", "https://a.com/6"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    cfg = CleaningConfig(near_dup_threshold=0.5)
    wd = str(tmp_path / "cleanwd")

    clean1, m1, r1 = clean_corpus_staged(spark, wd, docs, cfg, url_col="url")
    assert [e for e in r1.events] == [
        ("clean_url_dedup", "built"), ("clean_quality", "built"),
        ("clean_exact_dedup", "built"), ("clean_near_dup", "built")]
    assert sorted(r["doc_id"] for r in clean1.collect()) == [1, 2]
    # staged metrics == unstaged metrics (minus the input row)
    _, m_unstaged = clean_corpus(docs, cfg, url_col="url")
    want = {r["stage"]: r["rows"] for r in m_unstaged.collect()}
    got = {r["stage"]: r["rows"] for r in m1.collect()}
    assert got == {
        "clean_url_dedup": want["url_dedup"],
        "clean_quality": want["quality_keep"],
        "clean_exact_dedup": want["exact_dedup"],
        "clean_near_dup": want["near_dup"],
    }

    # re-run: every stage skipped, identical survivors
    clean2, m2, r2 = clean_corpus_staged(spark, wd, docs, cfg, url_col="url")
    assert all(kind == "skipped" for _, kind in r2.events)
    assert sorted(r["doc_id"] for r in clean2.collect()) == [1, 2]
    assert {r["stage"]: r["rows"] for r in m2.collect()} == got

    # knob change invalidates the chain (config hash feeds every build id)
    _, _, r3 = clean_corpus_staged(
        spark, wd, docs, CleaningConfig(near_dup_threshold=0.9), url_col="url"
    )
    assert all(kind == "built" for _, kind in r3.events)


def test_clean_corpus_decontaminate_stage(spark):
    evald = spark.createDataFrame(
        [(900, GOOD + "first story about the forest")],
        "doc_id long, text string")
    rows = [
        (1, GOOD + "first story about the forest", "https://a.com/1"),
        (2, GOOD2 + "second story about the sea", "https://a.com/2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    clean, metrics = clean_corpus(
        docs, CleaningConfig(near_dup_threshold=0.99),
        url_col="url", eval_df=evald)
    assert [r["doc_id"] for r in clean.collect()] == [2]
    m = {r["stage"]: r["rows"] for r in metrics.collect()}
    assert m["near_dup"] == 2 and m["decontaminate"] == 1
