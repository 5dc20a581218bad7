"""Mention detection: join variant == trie variant == naive oracle;
recall 1.0 on planted gold mentions."""

from pyspark.sql import functions as F

from ontology_mapping_spark.operators.labels import extract_labels
from ontology_mapping_spark.operators.mentions import (
    label_phrases,
    mention_triples,
    mentions_via_join,
    mentions_via_trie,
)
from ontology_mapping_spark.sources.pages import extracted_pages
from ontology_mapping_spark.textnorm import normalize_py
from tests import oracle


def naive_mentions(pages_rows, phrase_rows):
    """Independent O(pages × phrases × positions) oracle."""
    out = {}
    for url, text in pages_rows:
        toks = normalize_py(text).split()
        for uri, phrase in phrase_rows:
            p = phrase.split()
            c = sum(
                1
                for i in range(len(toks) - len(p) + 1)
                if toks[i : i + len(p)] == p
            )
            if c > 0:
                out[(url, uri, phrase)] = c
    return out


def _phrase_rows(fx):
    labels = oracle.extract_labels(fx.triples)
    rows = set()
    for uri, ls in labels.items():
        for raw in ls:
            ph = normalize_py(raw)
            if ph:
                rows.add((uri, ph))
    return sorted(rows)


def test_join_equals_trie_equals_oracle(spark, fx, fx_dfs):
    labels_df = extract_labels(fx_dfs["triples"])
    phrases = label_phrases(labels_df).cache()
    pages_txt = extracted_pages(fx_dfs["pages"]).cache()

    got_join = {
        (r["url"], r["uri"], r["surface"]): r["n_hits"]
        for r in mentions_via_join(pages_txt, phrases).collect()
    }
    got_trie = {
        (r["url"], r["uri"], r["surface"]): r["n_hits"]
        for r in mentions_via_trie(pages_txt, phrases).collect()
    }
    pages_rows = [
        (p["url"], p["text"]) for p in fx.web_pages if p["lang"] == "en"
    ]
    want = naive_mentions(pages_rows, _phrase_rows(fx))
    assert got_join == want
    assert got_trie == want


def test_planted_gold_recall_is_one(spark, fx, fx_dfs):
    labels_df = extract_labels(fx_dfs["triples"])
    phrases = label_phrases(labels_df)
    pages_txt = extracted_pages(fx_dfs["pages"])
    triples = mention_triples(mentions_via_join(pages_txt, phrases))
    got = {(r["subject"], r["object"]) for r in triples.collect()}
    gold = {(uri, url) for url, uri in fx.gold_mentions}
    missing = gold - got
    assert not missing, f"missed planted mentions: {sorted(missing)[:5]}"


def test_extraction_matches_stored_text(spark, fx_dfs):
    # extracted html text must equal the stored ground-truth text column
    pages = fx_dfs["pages"]
    ext = extracted_pages(pages, lang=None)
    cmp = pages.select("url", F.col("text").alias("want")).join(ext, "url")
    bad = cmp.filter(F.col("text") != F.col("want")).count()
    assert bad == 0
