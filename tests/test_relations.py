"""Relation extraction vs a pure-Python twin of the documented contract."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ontology_mapping_spark.operators.relations import (
    DEFAULT_PATTERNS,
    cooccurrence_edges,
    extract_relations,
    pattern_relations,
    sentence_mentions,
    split_sentences,
)

# ---------------------------------------------------------------------- twin


def fold_py(s: str) -> str:
    return re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", s.lower())).strip()


def split_py(text: str) -> list[str]:
    return [s for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]


def mentions_py(sentence: str, phrases: dict[str, str]):
    """[(uri, phrase, pos, len)] — first whole-token occurrence in the
    padded folded sentence, same as the engine."""
    padded = f" {fold_py(sentence)} "
    out = []
    for uri, ph in phrases.items():
        pos = padded.find(f" {ph} ") + 1  # 1-based like F.instr; 0 = miss
        if pos > 0:
            out.append((uri, ph, pos, len(ph)))
    return out


def relations_py(pages, phrases, patterns=DEFAULT_PATTERNS):
    cooc: dict[tuple[str, str], int] = {}
    typed: dict[tuple[str, str, str], int] = {}
    for _url, text in pages:
        for sent in split_py(text):
            padded = f" {fold_py(sent)} "
            ms = mentions_py(sent, phrases)
            uris = sorted({u for u, *_ in ms})
            for i, s in enumerate(uris):
                for o in uris[i + 1 :]:
                    cooc[(s, o)] = cooc.get((s, o), 0) + 1
            seen = set()
            for ua, _pa, pa, la in ms:
                for ub, _pb, pb, lb in ms:
                    if ua == ub or pb <= pa + la:
                        continue
                    between = padded[pa + la : pb - 1].strip()
                    pred = patterns.get(between)
                    if pred and (ua, pred, ub) not in seen:
                        seen.add((ua, pred, ub))
                        typed[(ua, pred, ub)] = typed.get((ua, pred, ub), 0) + 1
    return cooc, typed


PHRASES = {
    "u:cat": "cat",
    "u:animal": "animal",
    "u:tail": "long tail",
    "u:paris": "paris",
    "u:france": "france",
    "u:cat2": "cat",  # ambiguous surface: two URIs share a phrase
}

PAGES = [
    ("p1", "A cat is an animal. The long tail, part of the cat! Paris is located in France."),
    ("p2", "Paris and France... The cat sat. An animal appeared; no pattern links them."),
    ("p3", "cat is a animal and animal is the cat."),  # both directions, one sentence
    ("p4", "catfish is not a cat mention. long tail is a animal"),  # boundary + no-punct tail
]


def _dfs(spark):
    pages = spark.createDataFrame(PAGES, "url string, text string")
    phrases = spark.createDataFrame(
        sorted(PHRASES.items()), "uri string, phrase string"
    )
    return pages, phrases


def test_relations_match_python_twin(spark):
    pages, phrases = _dfs(spark)
    cooc_df, typed_df = extract_relations(pages, phrases)
    got_cooc = {(r.subj, r.obj): r.n_sents for r in cooc_df.collect()}
    got_typed = {(r.subj, r.pred, r.obj): r.n for r in typed_df.collect()}
    want_cooc, want_typed = relations_py(PAGES, PHRASES)
    assert got_cooc == want_cooc
    assert got_typed == want_typed


def test_pattern_specifics(spark):
    pages, phrases = _dfs(spark)
    m = sentence_mentions(split_sentences(pages), phrases)
    typed = {(r.subj, r.pred, r.obj): r.n for r in pattern_relations(m).collect()}
    # p1: 'cat is an animal' (ambiguous cat -> two subj uris)
    assert typed[("u:cat", "kg:isA", "u:animal")] >= 1
    assert typed[("u:cat2", "kg:isA", "u:animal")] == typed[("u:cat", "kg:isA", "u:animal")]
    # p1: 'long tail, part of the cat' folds to 'long tail part of the cat'
    # -> between is 'part of the', which is NOT an exact pattern
    assert ("u:tail", "kg:partOf", "u:cat") not in typed
    # p1: 'Paris is located in France' -> between 'is located in' not exact
    assert ("u:paris", "kg:locatedIn", "u:france") not in typed
    # p3 'cat is a animal and animal is the cat': the forward triple counts
    # p1 + p3; the reverse clause is built from SECOND occurrences, which
    # the first-occurrence contract deliberately does not see
    assert typed[("u:cat", "kg:isA", "u:animal")] == 2
    assert ("u:animal", "kg:isA", "u:cat") not in typed
    # p4: 'long tail is a animal' (no trailing punctuation) still matches
    assert typed[("u:tail", "kg:isA", "u:animal")] == 1


def test_word_boundaries_and_cooccurrence(spark):
    pages, phrases = _dfs(spark)
    m = sentence_mentions(split_sentences(pages), phrases)
    rows = m.filter("url = 'p4'").collect()
    # 'catfish' must not match 'cat'; the explicit 'cat mention' does
    s0 = [r for r in rows if r.sent_id == 0]
    assert {r.uri for r in s0} == {"u:cat", "u:cat2"}
    assert all(r.pos > 1 for r in s0)  # matched the real 'cat', not 'catfish'
    cooc = {(r.subj, r.obj): r.n_sents for r in cooccurrence_edges(m).collect()}
    # p2 sentence 1: 'Paris and France...' co-occur without any pattern
    assert cooc[("u:france", "u:paris")] == 2  # p1 and p2
    # ambiguous-surface pair counted once per sentence, both URIs present
    assert ("u:cat", "u:cat2") in cooc


def test_relation_confidence_npmi_twin(spark):
    import math

    from ontology_mapping_spark.operators.relations import relation_confidence

    pages, phrases = _dfs(spark)
    m = sentence_mentions(split_sentences(pages), phrases)
    got = {
        (r.subj, r.obj): (r.n_sents, round(r.npmi, 6))
        for r in relation_confidence(m).collect()
    }
    # twin: per-sentence distinct uri sets over the same fold contract
    sents = []
    for _url, text in PAGES:
        for sent in split_py(text):
            uris = sorted({u for u, *_ in mentions_py(sent, PHRASES)})
            if uris:
                sents.append(uris)
    n_total = len(sents)
    ent: dict[str, int] = {}
    cooc: dict[tuple[str, str], int] = {}
    for uris in sents:
        for u in uris:
            ent[u] = ent.get(u, 0) + 1
        for i, s in enumerate(uris):
            for o in uris[i + 1 :]:
                cooc[(s, o)] = cooc.get((s, o), 0) + 1
    want = {}
    for (s, o), n in cooc.items():
        p_so, p_s, p_o = n / n_total, ent[s] / n_total, ent[o] / n_total
        npmi = 1.0 if n == n_total else math.log(p_so / (p_s * p_o)) / -math.log(p_so)
        want[(s, o)] = (n, round(npmi, 6))
    assert got == want
    # ambiguous surface 'cat'/'cat2' always co-occur -> perfect association
    assert got[("u:cat", "u:cat2")][1] == 1.0


def test_relations_random_corpus_matches_twin(spark):
    """Seeded-random adversarial corpus (overlapping phrases, pattern
    words as entity tokens, repeated mentions, punctuation noise) vs the
    pure-Python twin — one Spark job over the whole case set."""
    import random

    rng = random.Random(20260818)
    toks = ["is", "a", "part", "of", "in", "cat", "dog", "x1", "located"]
    phr = ["cat", "dog", "x1", "cat dog", "dog x1", "part", "in"]
    phrases = {f"u{i}": p for i, p in enumerate(phr)}
    pages = []
    for i in range(60):
        sents = []
        for _ in range(rng.randint(1, 4)):
            words = [rng.choice(toks) for _ in range(rng.randint(0, 10))]
            punct = rng.choice([".", "!", "?", ""])
            sents.append(" ".join(words) + punct)
        pages.append((f"r{i}", " ".join(sents)))
    pages_df = spark.createDataFrame(pages, "url string, text string")
    phrases_df = spark.createDataFrame(
        sorted(phrases.items()), "uri string, phrase string"
    )
    cooc_df, typed_df = extract_relations(pages_df, phrases_df)
    got_cooc = {(r.subj, r.obj): r.n_sents for r in cooc_df.collect()}
    got_typed = {(r.subj, r.pred, r.obj): r.n for r in typed_df.collect()}
    want_cooc, want_typed = relations_py(pages, phrases)
    assert got_cooc == want_cooc
    assert got_typed == want_typed
    assert len(want_cooc) >= 15  # the corpus actually exercises the algebra


def test_planted_relation_gold_recall(spark):
    """Distributed gold replay: every planted relation triple is either
    extracted or shadow-explained (B's folded label a whole-token
    subphrase of A's — the documented first-occurrence contract).
    Corpus-scale twin: tools/eval_relations_scale.py."""
    from ontology_mapping_spark.fixtures import (
        fixture_dataframes,
        make_fixture,
        synth_gold_relations_distributed,
        synth_pages_distributed,
    )
    from ontology_mapping_spark.operators.labels import extract_labels
    from ontology_mapping_spark.operators.mentions import label_phrases
    from ontology_mapping_spark.operators.relations import (
        fold_sentence,
        typed_relation_rows,
    )

    fx = make_fixture(n_pairs=15, n_extra_per_side=5, n_pages=0, seed=7)
    triples, _, _, _ = fixture_dataframes(spark, fx)
    kw = dict(mentions_per_page=(0, 8))
    pages = synth_pages_distributed(
        spark, 400, fx.pref_labels, seed=7, partitions=4,
        filler_sentences=(2, 4), **kw,
    )
    gold = synth_gold_relations_distributed(spark, 400, fx.pref_labels, seed=7, **kw)
    phrases = label_phrases(extract_labels(triples)).select(
        "uri", fold_sentence("phrase").alias("phrase")
    )
    det = typed_relation_rows(
        sentence_mentions(
            split_sentences(pages.filter("lang='en'").select("url", "text")),
            phrases,
        )
    ).select("url", "subj", "pred", "obj")
    n_gold = gold.count()
    assert n_gold > 50  # the 50% relation-sentence coin plants plenty
    missed = gold.join(det, ["url", "subj", "pred", "obj"], "left_anti").collect()
    folded = {u: fold_py(lbl) for u, lbl in fx.pref_labels.items()}
    for r in missed:
        a, b = folded[r["subj"]], folded[r["obj"]]
        assert f" {b} " in f" {a} ", (fx.pref_labels[r["subj"]], fx.pref_labels[r["obj"]])


def test_max_mentions_cap(spark):
    # a pathological "sentence" listing many entities: the cap keeps the
    # FIRST max_mentions in text order (pos sort), bounding the in-row
    # O(k^2) pair work
    phrases = spark.createDataFrame(
        [(f"u{i}", f"e{i}x") for i in range(8)], "uri string, phrase string"
    )
    pages = spark.createDataFrame(
        [("p", " ".join(f"e{i}x" for i in range(8)) + ".")],
        "url string, text string",
    )
    m = sentence_mentions(split_sentences(pages), phrases)
    assert cooccurrence_edges(m).count() == 28  # C(8,2) uncapped
    capped = cooccurrence_edges(m, max_mentions=3)
    got = {(r.subj, r.obj) for r in capped.collect()}
    # first three by position are u0,u1,u2
    assert got == {("u0", "u1"), ("u0", "u2"), ("u1", "u2")}


def test_plan_shape_two_shuffles_no_join(spark):
    # the pair algebra must stay within-row: exactly two hash exchanges
    # (group by sentence + final agg), vocabulary joined via broadcast,
    # and no sort-merge join / cartesian anywhere
    pages, phrases = _dfs(spark)
    for out in (
        pattern_relations(sentence_mentions(split_sentences(pages), phrases)),
        cooccurrence_edges(sentence_mentions(split_sentences(pages), phrases)),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        # corpus-keyed exchanges: the per-sentence group is the mention
        # table's ONLY one (pairs never shuffle); the other two hash
        # exchanges are the final triple agg and the ontology-sized
        # vocabulary dedup before its broadcast
        assert plan.count("Exchange hashpartitioning(url") == 1, plan
        assert plan.count("Exchange hashpartitioning") == 3, plan
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan and "Cartesian" not in plan, plan


def test_sentence_split_ids(spark):
    pages, _ = _dfs(spark)
    s = split_sentences(pages).filter("url = 'p1'").orderBy("sent_id").collect()
    assert [r.sent_id for r in s] == [0, 1, 2]
    assert s[1].sentence.startswith("The long tail")


# ------------------------------------------------- fused C sentence kernel

# adversarial page set for the split/fold/first-pos contract: Java-\s
# whitespace forms, unicode separators, the two exotic-lower code points
# (C-flagged -> Python re-entry), empty/null text, trailing delimiters,
# punctuation-only sentences, overlapping + nested phrases
NASTY_PAGES = [
    ("n1", "A cat is an animal. The long tail, part of the cat! Paris?"),
    ("n2", "cat\tis a animal.\t cat is a\x0banimal.\r\ncat!"),
    ("n3", ""),
    ("n4", None),
    ("n5", "no sentence punctuation at all cat is a animal"),
    ("n6", "ends with a delimiter. "),
    ("n7", "...!?. ?! . cat."),
    ("n8", "İstanbul cat is a animal. KELVIN K cat is a long tail."),
    ("n9", "héllo cät — cat is a animal; cat…is…a…animal. cat  is  a  animal."),
    ("n10", "cat cat cat is a cat. long tail is a long tail!"),
    ("n11", "x. y. z. cat is a animal. " * 3),
    ("n12", "中文 cat is a animal。cat is a animal.  cat!"),
]


def _nasty_dfs(spark):
    pages = spark.createDataFrame(NASTY_PAGES, "url string, text string")
    phrases = spark.createDataFrame(
        sorted(PHRASES.items()), "uri string, phrase string"
    )
    return pages, phrases


def _norm_groups(df):
    return [
        (r.url, r.sent_id, r.padded, sorted(map(tuple, r.ms)))
        for r in df.collect()
    ]


def _native_ready() -> bool:
    from ontology_mapping_spark.operators.mentions import _native_available

    return _native_available()


def test_native_groups_match_join_path(spark):
    """The C sentence kernel (split+fold+first-pos match+group in one
    pass, exotic pages Python-re-entered) must equal the Catalyst path
    row-for-row — padded text, sent_id numbering, positions, fan-out."""
    import pytest

    from ontology_mapping_spark.operators.relations import (
        relation_confidence,
        sentence_mention_groups,
    )

    if not _native_ready():
        pytest.skip("no C compiler: native sentence kernel unavailable")
    pages, phrases = _nasty_dfs(spark)
    join = sorted(_norm_groups(sentence_mention_groups(pages, phrases, impl="join")))
    nat = sorted(_norm_groups(sentence_mention_groups(pages, phrases, impl="cnative")))
    assert nat == join
    assert len(nat) >= 15  # the fixture actually produces mention groups
    # the flagged exotic page is present and correct (not dropped)
    assert any(u == "n8" for u, *_ in nat)
    # consumers agree end-to-end on both shapes
    for fn in (pattern_relations, cooccurrence_edges, relation_confidence):
        a = sorted(
            map(tuple, fn(sentence_mention_groups(pages, phrases, impl="join")).collect())
        )
        b = sorted(
            map(tuple, fn(sentence_mention_groups(pages, phrases, impl="cnative")).collect())
        )
        assert a == b, fn.__name__


def test_native_groups_random_corpus(spark):
    """Seeded-random corpus (pattern words as entity tokens, overlap,
    whitespace noise) through the C kernel vs the pure-Python twin."""
    import pytest
    import random

    from ontology_mapping_spark.operators.relations import (
        extract_relations,
    )

    if not _native_ready():
        pytest.skip("no C compiler: native sentence kernel unavailable")
    rng = random.Random(20260820)
    toks = ["is", "a", "part", "of", "in", "cat", "dog", "x1", "located"]
    phr = ["cat", "dog", "x1", "cat dog", "dog x1", "part", "in"]
    phrases = {f"u{i}": p for i, p in enumerate(phr)}
    pages = []
    for i in range(60):
        sents = []
        for _ in range(rng.randint(1, 4)):
            words = [rng.choice(toks) for _ in range(rng.randint(0, 10))]
            punct = rng.choice([".", "!", "?", "", "?  ", ".\t"])
            sents.append(" ".join(words) + punct)
        pages.append((f"r{i}", " ".join(sents)))
    pages_df = spark.createDataFrame(pages, "url string, text string")
    phrases_df = spark.createDataFrame(
        sorted(phrases.items()), "uri string, phrase string"
    )
    cooc_df, typed_df = extract_relations(pages_df, phrases_df, impl="cnative")
    got_cooc = {(r.subj, r.obj): r.n_sents for r in cooc_df.collect()}
    got_typed = {(r.subj, r.pred, r.obj): r.n for r in typed_df.collect()}
    want_cooc, want_typed = relations_py(pages, phrases)
    assert got_cooc == want_cooc
    assert got_typed == want_typed


def test_py_group_rows_degradation_twin(spark):
    """The compiler-less executor fallback (_py_group_rows) must equal the
    Catalyst join path — it is what heterogeneous hosts actually run."""
    from ontology_mapping_spark.operators.mentions import canonical_phrase_rows
    from ontology_mapping_spark.operators.relations import (
        _py_group_rows,
        group_mention_rows,
    )

    pages, phrases = _nasty_dfs(spark)
    join = sorted(
        _norm_groups(
            group_mention_rows(sentence_mentions(split_sentences(pages), phrases))
        )
    )
    vocab = canonical_phrase_rows(
        [(r.uri, r.phrase) for r in phrases.collect()]
    )
    texts = [t for _u, t in NASTY_PAGES]
    got = sorted(
        (
            NASTY_PAGES[i][0],
            sid,
            padded,
            sorted((m["pos"], m["mlen"], m["uri"]) for m in ms),
        )
        for i, sid, padded, ms in _py_group_rows(vocab, texts)
    )
    assert got == join


def test_native_plan_has_no_pre_agg_exchange(spark):
    """The fused kernel's plan: pattern_relations over native groups has
    exactly ONE exchange (the final triple agg) — the sentence-group
    exchange of the join path is gone."""
    import pytest

    from ontology_mapping_spark.operators.relations import (
        sentence_mention_groups,
    )

    if not _native_ready():
        pytest.skip("no C compiler: native sentence kernel unavailable")
    pages, phrases = _dfs(spark)
    out = pattern_relations(sentence_mention_groups(pages, phrases, impl="cnative"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan, plan


def test_native_scan_chunked_array_input_parity():
    """Arrow inputs to the zero-copy C scans may arrive as multi-chunk
    ChunkedArrays; `_flat_bytes_input` combines chunks into a FRESH
    buffer, which the caller must keep alive through the C call (a bare
    address would be freed at helper return — the use-after-free class).
    Pin: list / single Array / multi-chunk ChunkedArray inputs produce
    identical scans, including the null-fallback path."""
    import pytest

    if not _native_ready():
        pytest.skip("no C compiler: native kernel unavailable")
    import numpy as np
    import pyarrow as pa

    from ontology_mapping_spark.native import NativeMatcher

    nm = NativeMatcher([("u0", "cat"), ("u1", "dog"), ("u2", "cat dog")])
    texts = [
        ("the cat sat. a dog ran! cat dog here. " * 40).encode(),
        b"",
        ("no hits in this one at all. " * 60).encode(),
        ("dog. cat? cat dog! " * 80).encode(),
    ] * 8
    def norm(out):
        page_idx, sent_id, nh, padded, pat_idx, pos, flags = out
        return (
            [int(x) for x in page_idx],
            [int(x) for x in sent_id],
            [int(x) for x in nh],
            padded.to_pylist(),
            [int(x) for x in pat_idx],
            [int(x) for x in pos],
            [int(x) for x in flags],
        )

    want = norm(nm.scan_sentences(texts))
    one = pa.array([t.decode() for t in texts], type=pa.string())
    assert norm(nm.scan_sentences(one)) == want
    # multi-chunk: combine_chunks allocates the fresh buffer at risk
    chunked = pa.chunked_array(
        [one.slice(0, 5), one.slice(5, 11), one.slice(16)]
    )
    assert chunked.num_chunks == 3
    assert norm(nm.scan_sentences(chunked)) == want
    # large_string exercises the int64-offset branch
    assert norm(nm.scan_sentences(one.cast(pa.large_string()))) == want
    # null fallback (list-normalized path) — null scans as empty page
    with_null = pa.chunked_array(
        [pa.array([texts[0].decode(), None]), pa.array([texts[3].decode()])]
    )
    got = norm(nm.scan_sentences(with_null))
    ref = norm(nm.scan_sentences([texts[0], b"", texts[3]]))
    assert got == ref

    if nm.supports_html():
        htmls = [b"<html><body><p>cat dog. dog!</p></body></html>"] * 6 + [None]
        harr = pa.chunked_array(
            [pa.array(htmls[:2], type=pa.binary()),
             pa.array(htmls[2:], type=pa.binary())]
        )
        a = nm.scan_batch_hits_html([h if h is not None else b"" for h in htmls])
        b = nm.scan_batch_hits_html(harr)
        za = sorted(zip(*(np.asarray(x).tolist() for x in a)))
        zb = sorted(zip(*(np.asarray(x).tolist() for x in b)))
        assert za == zb and len(za) > 0
