"""Mention disambiguation vs the pure-Python embedding/cosine twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapping_spark.functions.vectors import cosine_py, embed_text_py
from ontology_mapping_spark.operators.disambig import (
    ambiguous_mentions,
    disambiguate_mentions,
    resolve_mentions,
)

PAGES = [
    ("p1", "The cat sat with feline whiskers on the pet blanket."),
    ("p2", "A cat excavator machine digger dug the cat trench."),
    ("p3", "Nothing ambiguous lives here, just a dog."),
]
# 'cat' is claimed by two concepts with very different contexts
CONCEPT_CTX = {
    "u:catA": "feline pet whiskers blanket purr",
    "u:catB": "excavator machine digger trench hydraulic",
    "u:dog": "dog canine bark",
}
MENTIONS = [
    ("p1", "u:catA", "cat"),
    ("p1", "u:catB", "cat"),
    ("p2", "u:catA", "cat"),
    ("p2", "u:catB", "cat"),
    ("p3", "u:dog", "dog"),  # unambiguous — must pass through untouched
]


def _dfs(spark):
    pages = spark.createDataFrame(PAGES, "url string, text string")
    mentions = spark.createDataFrame(MENTIONS, "url string, uri string, surface string")
    vecs = spark.createDataFrame(
        [(u, embed_text_py(ctx)) for u, ctx in sorted(CONCEPT_CTX.items())],
        "uri string, vec array<double>",
    )
    return pages, mentions, vecs


def _twin_argmax(url_text: str, candidates: list[str]) -> str:
    pv = embed_text_py(url_text)
    best = max(
        ((cosine_py(pv, embed_text_py(CONCEPT_CTX[u])), u) for u in candidates),
    )
    return best[1]


def test_disambiguation_matches_twin(spark):
    pages, mentions, vecs = _dfs(spark)
    got = {
        (r["url"], r["surface"]): (r["uri"], r["score"])
        for r in disambiguate_mentions(mentions, pages, vecs).collect()
    }
    assert set(got) == {("p1", "cat"), ("p2", "cat")}  # only ambiguous rows
    texts = dict(PAGES)
    for (url, _s), (uri, score) in got.items():
        want_uri = _twin_argmax(texts[url], ["u:catA", "u:catB"])
        assert uri == want_uri, (url, uri, want_uri)
        pv = embed_text_py(texts[url])
        assert abs(score - cosine_py(pv, embed_text_py(CONCEPT_CTX[uri]))) < 1e-6
    # context separation sanity: each page picked its own concept
    assert got[("p1", "cat")][0] == "u:catA"
    assert got[("p2", "cat")][0] == "u:catB"


def test_resolve_keeps_unambiguous_and_one_winner(spark):
    pages, mentions, vecs = _dfs(spark)
    out = resolve_mentions(mentions, pages, vecs)
    rows = {(r["url"], r["surface"], r["uri"]) for r in out.collect()}
    assert rows == {
        ("p1", "cat", "u:catA"),
        ("p2", "cat", "u:catB"),
        ("p3", "dog", "u:dog"),
    }
    # schema passthrough: same columns as the input mention table
    assert set(out.columns) == set(mentions.columns)


def test_ambiguous_subset_and_plan(spark):
    pages, mentions, vecs = _dfs(spark)
    amb = ambiguous_mentions(mentions)
    assert {(r["url"], r["uri"]) for r in amb.collect()} == {
        ("p1", "u:catA"), ("p1", "u:catB"), ("p2", "u:catA"), ("p2", "u:catB"),
    }
    plan = (
        disambiguate_mentions(mentions, pages, vecs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # concept vectors must broadcast; no cartesian anywhere
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan


def test_resolve_keeps_unscorable_ambiguous_mentions(spark):
    """An ambiguous mention whose page has no text row (or whose candidates
    have no concept vector) must survive resolution via the deterministic
    max-uri fallback (the scored path's tie-break direction) — never
    silently vanish from the resolved table."""
    pages, mentions, vecs = _dfs(spark)
    # p1 disappears from the text corpus -> its 'cat' mention can't be
    # context-scored; p2 keeps its scored winner
    pages_missing = pages.filter(F.col("url") != "p1")
    out = {
        (r["url"], r["surface"]): r["uri"]
        for r in resolve_mentions(mentions, pages_missing, vecs).collect()
    }
    assert out[("p1", "cat")] == "u:catB"  # max-uri fallback, deterministic
    assert out[("p2", "cat")] == "u:catB"  # scored path unaffected
    assert out[("p3", "dog")] == "u:dog"
    assert len(out) == 3

    # same survival when the candidates have no vectors at all
    vecs_dogonly = vecs.filter(F.col("uri") == "u:dog")
    out2 = {
        (r["url"], r["surface"]): r["uri"]
        for r in resolve_mentions(mentions, pages, vecs_dogonly).collect()
    }
    assert out2[("p1", "cat")] == "u:catB"
    assert out2[("p2", "cat")] == "u:catB"  # fallback on both now
    assert len(out2) == 3


def test_resolve_fallback_keeps_all_rows_of_chosen_uri(spark):
    """Multiplicity contract: like the scored-winner path, the fallback
    keeps EVERY mention row of the chosen uri (e.g. distinct spans), not
    one arbitrary representative."""
    pages, _m, vecs = _dfs(spark)
    mentions = spark.createDataFrame(
        [
            ("p9", "u:catA", "cat", 1),
            ("p9", "u:catB", "cat", 2),
            ("p9", "u:catB", "cat", 7),  # chosen uri appears twice
        ],
        "url string, uri string, surface string, span int",
    )
    out = resolve_mentions(mentions, pages, vecs).collect()  # p9 unscorable
    assert sorted((r["uri"], r["span"]) for r in out) == [
        ("u:catB", 2),
        ("u:catB", 7),
    ]
