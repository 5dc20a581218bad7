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


# ---- kernel equivalence: blocked / automaton vs the trie walker ----------

def test_blocked_kernel_equals_trie_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ontology_mapping_spark.operators.mentions import (
        _build_blocked_index,
        _build_trie,
        scan_tokens_blocked_py,
        scan_tokens_py,
    )

    tok = st.sampled_from(["a", "b", "ab", "c", "x1"])
    phrase = st.lists(tok, min_size=1, max_size=3).map(" ".join)

    @settings(max_examples=200, deadline=None)
    @given(
        toks=st.lists(tok, min_size=0, max_size=12),
        phrases=st.lists(phrase, min_size=0, max_size=6),
    )
    def check(toks, phrases):
        rows = [(f"u{i}", p) for i, p in enumerate(phrases)]
        want = scan_tokens_py(_build_trie(rows), toks)
        got = scan_tokens_blocked_py(_build_blocked_index(rows), toks)
        assert got == want

    check()


def test_blocked_kernel_overlap_boundary():
    # "a b" in "a b a b": start positions 0 and 2 share the middle space —
    # str.count would see 1; the find-step-by-one loop must see 2
    from ontology_mapping_spark.operators.mentions import (
        _build_blocked_index,
        scan_tokens_blocked_py,
    )

    idx = _build_blocked_index([("u", "a b")])
    assert scan_tokens_blocked_py(idx, ["a", "b", "a", "b"]) == {("u", "a b"): 2}


def test_trie_kernel_via_dataframe(spark, fx, fx_dfs):
    # kernel='trie' and kernel='blocked' produce identical DataFrames
    labels_df = extract_labels(fx_dfs["triples"])
    phrases = label_phrases(labels_df).cache()
    pages_txt = extracted_pages(fx_dfs["pages"]).cache()
    a = {
        (r["url"], r["uri"], r["surface"]): r["n_hits"]
        for r in mentions_via_trie(pages_txt, phrases, kernel="trie").collect()
    }
    b = {
        (r["url"], r["uri"], r["surface"]): r["n_hits"]
        for r in mentions_via_trie(pages_txt, phrases, kernel="blocked").collect()
    }
    assert a == b and a


def test_automaton_kernel_equivalence():
    # exercised only where pyahocorasick ships; skips cleanly here
    import pytest

    ahocorasick = pytest.importorskip("ahocorasick")  # noqa: F841
    from ontology_mapping_spark.operators.mentions import (
        _build_automaton,
        _build_trie,
        scan_tokens_automaton_py,
        scan_tokens_py,
    )

    rows = [("u1", "a b"), ("u2", "a b"), ("u3", "b"), ("u4", "a b c")]
    toks = ["a", "b", "a", "b", "c", "b"]
    want = scan_tokens_py(_build_trie(rows), toks)
    got = scan_tokens_automaton_py(_build_automaton(rows), toks)
    assert got == want


def test_cnative_kernel_equals_trie_property():
    import pytest

    from ontology_mapping_spark.operators.mentions import _native_available

    if not _native_available():
        pytest.skip("no C compiler on this host")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ontology_mapping_spark.native import NativeMatcher
    from ontology_mapping_spark.operators.mentions import _build_trie, scan_tokens_py

    tok = st.sampled_from(["a", "b", "ab", "ba", "c", "x1", "κό"])
    phrase = st.lists(tok, min_size=1, max_size=4).map(" ".join)

    @settings(max_examples=300, deadline=None)
    @given(
        pages=st.lists(st.lists(tok, min_size=0, max_size=16), min_size=0, max_size=4),
        phrases=st.lists(phrase, min_size=0, max_size=8),
    )
    def check(pages, phrases):
        rows = [(f"u{i}", p) for i, p in enumerate(phrases)]
        trie = _build_trie(rows)
        nm = NativeMatcher(rows)
        # per-page path
        for toks in pages:
            assert nm.scan_tokens(toks) == scan_tokens_py(trie, toks)
        # batch path (the production Arrow-emitter path)
        pi, keys, cnt = nm.scan_batch_flat(pages)
        got = {}
        for p, ks, c in zip(pi, keys, cnt):
            for k in ks:
                got.setdefault(int(p), {})[k] = int(c)
        want = {
            i: d
            for i, d in ((i, scan_tokens_py(trie, t)) for i, t in enumerate(pages))
            if d
        }
        assert got == want

    check()


def test_cnative_kernel_via_dataframe(spark, fx, fx_dfs):
    import pytest

    from ontology_mapping_spark.operators.mentions import _native_available

    if not _native_available():
        pytest.skip("no C compiler on this host")
    labels_df = extract_labels(fx_dfs["triples"])
    phrases = label_phrases(labels_df).cache()
    pages_txt = extracted_pages(fx_dfs["pages"]).cache()
    a = {
        (r["url"], r["uri"], r["surface"]): r["n_hits"]
        for r in mentions_via_trie(pages_txt, phrases, kernel="trie").collect()
    }
    b = {
        (r["url"], r["uri"], r["surface"]): r["n_hits"]
        for r in mentions_via_trie(pages_txt, phrases, kernel="cnative").collect()
    }
    assert a == b and a


# ---- fused fold path: C-side case-fold + tokenize (round 3) --------------

def test_foldable_text_tokenizes_like_python_property():
    # foldable_text_py bytes, tokenized by the C fold contract (A-Z->a-z,
    # [a-z0-9] kept, every other byte a separator), must equal
    # _tokens_from_text over arbitrary unicode — including the two
    # non-fold-safe code points it routes through the Python tokenizer.
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ontology_mapping_spark.textnorm import _tokens_from_text, foldable_text_py

    def c_fold_tokens(bs: bytes) -> list[str]:
        # byte-exact model of acscan.c fold_byte + separator collapsing
        out, cur = [], []
        for byte in bs:
            c = chr(byte)
            if "A" <= c <= "Z":
                cur.append(c.lower())
            elif ("a" <= c <= "z") or ("0" <= c <= "9"):
                cur.append(c)
            else:
                if cur:
                    out.append("".join(cur))
                    cur = []
        if cur:
            out.append("".join(cur))
        return out

    @settings(max_examples=300, deadline=None)
    @given(
        text=st.text(
            alphabet=st.one_of(
                st.characters(),
                st.sampled_from(list("İKK AaZz09 .,-_é台🎉")),
            ),
            max_size=80,
        )
    )
    def check(text):
        assert c_fold_tokens(foldable_text_py(text)) == _tokens_from_text(text)

    check()


def test_foldable_html_matches_token_path_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ontology_mapping_spark.textnorm import (
        _tokens_from_text,
        foldable_text_from_html_py,
        tokens_from_html_py,
    )

    frag = st.sampled_from(
        [
            "<p>", "</p>", "<script>var x=1;</script>", "<!-- hi -->",
            "&amp;", "&lt;b&gt;", "Hello", "WORLD", "café", "İzmir",
            "x9 ", " , ", "<style>.a{}</style>", "<b title='q'>",
        ]
    )

    @settings(max_examples=200, deadline=None)
    @given(parts=st.lists(frag, min_size=0, max_size=12))
    def check(parts):
        html = "".join(parts)
        fold_bytes = foldable_text_from_html_py(html)
        # decode+Python-tokenize the fold bytes: equals the C fold for
        # fold-safe bytes (property above), so this pins the HTML path
        assert _tokens_from_text(
            fold_bytes.decode("utf-8", errors="replace")
        ) == tokens_from_html_py(html)

    check()


def test_hits_scanner_fold_path_equals_trie_property():
    import pytest

    from ontology_mapping_spark.operators.mentions import _native_available

    if not _native_available():
        pytest.skip("no C compiler on this host")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ontology_mapping_spark.native import NativeMatcher
    from ontology_mapping_spark.operators.mentions import (
        _build_trie,
        _emulate_hits,
        canonical_phrase_rows,
        scan_tokens_py,
    )
    from ontology_mapping_spark.textnorm import _tokens_from_text, foldable_text_py

    word = st.sampled_from(["a", "b", "ab", "ba", "c", "x1", "Aa", "κό", "İq"])
    phrase = st.lists(
        st.sampled_from(["a", "b", "ab", "ba", "c", "x1", "aa"]),
        min_size=1,
        max_size=3,
    ).map(" ".join)

    @settings(max_examples=200, deadline=None)
    @given(
        pages=st.lists(
            st.lists(word, min_size=0, max_size=16).map(" ".join),
            min_size=0,
            max_size=5,
        ),
        phrases=st.lists(phrase, min_size=0, max_size=8),
    )
    def check(pages, phrases):
        rows = canonical_phrase_rows([(f"u{i}", p) for i, p in enumerate(phrases)])
        texts = [foldable_text_py(t) for t in pages]
        want = {}
        trie = _build_trie(rows)
        for i, t in enumerate(pages):
            for (u, s), c in scan_tokens_py(trie, _tokens_from_text(t)).items():
                want[(i, u, s)] = c
        nm = NativeMatcher(rows)
        sel, uris, surfs, nh = nm.expand_hits(*nm.scan_batch_hits_text(texts))
        got = {
            (int(p), u, s): int(c)
            for p, u, s, c in zip(
                sel.tolist(), uris.to_pylist(), surfs.to_pylist(), nh.tolist()
            )
        }
        assert got == want
        # the compiler-less fallback produces the identical flat shape
        esel, euris, esurfs, enh = _emulate_hits(
            lambda toks: scan_tokens_py(trie, toks), texts
        )
        egot = {
            (int(p), u, s): int(c)
            for p, u, s, c in zip(
                esel.tolist(), euris.to_pylist(), esurfs.to_pylist(), enh.tolist()
            )
        }
        assert egot == want

    check()


def test_canonical_phrase_rows_contract():
    # duplicate (uri, phrase) pairs and irregular whitespace: every kernel
    # must count each key once and emit the canonical surface (ADVICE r2)
    import pytest

    from ontology_mapping_spark.operators.mentions import (
        _build_trie,
        _native_available,
        canonical_phrase_rows,
        scan_tokens_py,
    )

    messy = [("u1", "  a   b "), ("u1", "a b"), ("u2", "a b"), ("u3", "\tc\n"), ("u3", "")]
    rows = canonical_phrase_rows(messy)
    assert rows == [("u1", "a b"), ("u2", "a b"), ("u3", "c")]
    toks = ["a", "b", "c", "a", "b"]
    want = {("u1", "a b"): 2, ("u2", "a b"): 2, ("u3", "c"): 1}
    assert scan_tokens_py(_build_trie(rows), toks) == want
    if _native_available():
        from ontology_mapping_spark.native import NativeMatcher

        # NativeMatcher applies the same canonicalization internally, so
        # the messy input itself must already match the canonical trie
        assert NativeMatcher(messy).scan_tokens(toks) == want


def test_mentions_from_html_cnative_equals_trie(spark, fx, fx_dfs):
    import pytest

    from ontology_mapping_spark.operators.mentions import (
        _native_available,
        mentions_from_html,
    )

    if not _native_available():
        pytest.skip("no C compiler on this host")
    labels_df = extract_labels(fx_dfs["triples"])
    phrases = label_phrases(labels_df).cache()
    pages = fx_dfs["pages"]
    a = {
        (r["url"], r["uri"], r["surface"]): r["n_hits"]
        for r in mentions_from_html(pages, phrases, kernel="trie").collect()
    }
    b = {
        (r["url"], r["uri"], r["surface"]): r["n_hits"]
        for r in mentions_from_html(pages, phrases, kernel="cnative").collect()
    }
    assert a == b and a


def test_c_html_extract_fold_matches_python_property():
    """The C extractor (comment/boiler/tag strip + entity decode + fold)
    must tokenize every UNFLAGGED page exactly like the Python pipeline,
    and must NOT flag plain-ASCII entity-free pages (the fast path has to
    actually cover the common case, or equivalence is vacuous)."""
    import pytest

    from ontology_mapping_spark.operators.mentions import _native_available

    if not _native_available():
        pytest.skip("no C compiler on this host")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ontology_mapping_spark.native import extract_fold_debug, load_entity_table
    from ontology_mapping_spark.textnorm import _tokens_from_text, tokens_from_html_py

    if load_entity_table() is None:
        pytest.skip("entity table unavailable")

    frag = st.sampled_from(
        [
            "<p>", "</p>", "<script>var x=1;</script>", "<SCRIPT>y</script >",
            "<!-- hi -->", "<!--", "-->", "<style>.a{}</style>", "<b title='q>'>",
            "&amp;", "&AMP", "&lt;b&gt;", "&notin;", "&Idot;", "&idot;",
            "&#65;", "&#x41;", "&#151;", "&#0;", "&#x110000;", "&#xD800;",
            "&bogus;", "&", "&&amp", "&ampx", "&CounterClockwiseContourIntegral;",
            "Hello", "WORLD", "café", "İzmir", "KK", "x9 ",
            " , ", "<nav>menu</nav>", "<title>T</title>", "a<b>c",
            "</", "<", ">", "plain text here", "&frac34;", "&nbsp;",
        ]
    )

    @settings(max_examples=400, deadline=None)
    @given(parts=st.lists(frag, min_size=0, max_size=14))
    def check(parts):
        html = "".join(parts).encode("utf-8")
        folded, flagged = extract_fold_debug(html)
        if flagged:
            return
        got = _tokens_from_text(folded.decode("utf-8", errors="replace"))
        assert got == tokens_from_html_py(html)

    check()
    # fast-path coverage: ASCII page with plain named/numeric entities
    plain = b"<html><!--c--><script>s</script><p>Hello &amp; WORLD &#65; x9</p></html>"
    folded, flagged = extract_fold_debug(plain)
    assert not flagged
    assert _tokens_from_text(folded.decode()) == ["hello", "world", "a", "x9"]


def test_scan_batch_hits_html_matches_python_pipeline_property():
    """End-to-end C html scan (incl. flagged-page Python reruns) equals the
    trie walker over tokens_from_html_py, for raw-bytes lists, Arrow
    binary arrays, large_binary, sliced arrays, and null entries."""
    import pytest

    from ontology_mapping_spark.operators.mentions import _native_available

    if not _native_available():
        pytest.skip("no C compiler on this host")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    from ontology_mapping_spark.native import NativeMatcher, load_entity_table
    from ontology_mapping_spark.operators.mentions import (
        _build_trie,
        canonical_phrase_rows,
        scan_tokens_py,
    )
    from ontology_mapping_spark.textnorm import tokens_from_html_py

    if load_entity_table() is None:
        pytest.skip("entity table unavailable")

    frag = st.sampled_from(
        [
            "<p>a b</p>", "a", "b", "ab", "x1", "<script>a b</script>",
            "&amp;a", "a&#32;b", "&Idot;a", "İ a", "café b",
            "<!--a-->b", "<b>A B</b>", "&lt;a&gt;", "KK b", "",
        ]
    )
    phrase = st.lists(
        st.sampled_from(["a", "b", "ab", "x1", "a b", "b a"]),
        min_size=1,
        max_size=2,
    ).map(" ".join)

    def hits_of(nm, res):
        sel, uris, surfs, nh = nm.expand_hits(*res)
        return {
            (int(p), u, s): int(c)
            for p, u, s, c in zip(
                sel.tolist(), uris.to_pylist(), surfs.to_pylist(), nh.tolist()
            )
        }

    @settings(max_examples=200, deadline=None)
    @given(
        pages=st.lists(
            st.lists(frag, min_size=0, max_size=6).map("".join), max_size=5
        ),
        phrases=st.lists(phrase, min_size=0, max_size=6),
    )
    def check(pages, phrases):
        rows = canonical_phrase_rows([(f"u{i}", p) for i, p in enumerate(phrases)])
        trie = _build_trie(rows)
        want = {}
        for i, h in enumerate(pages):
            for (u, s), c in scan_tokens_py(trie, tokens_from_html_py(h)).items():
                want[(i, u, s)] = c
        nm = NativeMatcher(rows)
        raw = [h.encode("utf-8") for h in pages]
        assert hits_of(nm, nm.scan_batch_hits_html(raw)) == want
        assert hits_of(nm, nm.scan_batch_hits_html(pa.array(raw, type=pa.binary()))) == want
        assert (
            hits_of(nm, nm.scan_batch_hits_html(pa.array(raw, type=pa.large_binary())))
            == want
        )

    check()

    # sliced-with-offset and null-bearing Arrow arrays take the copy path
    # but must produce identical results (null == empty page)
    rows = canonical_phrase_rows([("u0", "a"), ("u1", "a b")])
    nm = NativeMatcher(rows)
    raw = [b"zzz", b"<p>a b</p>", None, b"a &amp; a"]
    arr = pa.array([b"pad"] + raw, type=pa.binary()).slice(1)
    want = hits_of(nm, nm.scan_batch_hits_html([h or b"" for h in raw]))
    assert hits_of(nm, nm.scan_batch_hits_html(arr)) == want
    assert want == {
        (1, "u0", "a"): 1,
        (1, "u1", "a b"): 1,
        (3, "u0", "a"): 2,
    }

    # null-FREE sliced arrays stay on the zero-copy path (offset>0, data
    # buffer present) — pins the offset*4 / offset*8 index arithmetic for
    # both 32-bit (binary) and 64-bit (large_binary) offset widths
    raw_nn = [b"zzz", b"<p>a b</p>", b"", b"a &amp; a"]
    want_nn = hits_of(nm, nm.scan_batch_hits_html(raw_nn))
    assert want_nn == want
    for typ in (pa.binary(), pa.large_binary()):
        sliced = pa.array([b"pad", b"a a a"] + raw_nn, type=typ).slice(2)
        assert sliced.null_count == 0 and sliced.offset == 2
        assert hits_of(nm, nm.scan_batch_hits_html(sliced)) == want_nn


def test_make_html_hits_scanner_kernels_agree(spark):
    """The public scanner factory returns identical flat hits for every
    kernel on a corpus that exercises entities, boilerplate, flags."""
    from ontology_mapping_spark.operators.mentions import (
        _native_available,
        make_html_hits_scanner,
    )

    htmls = [
        b"<html><script>a b</script><p>Alpha beta &amp; GAMMA</p></html>",
        b"<p>alpha</p><p>beta gamma</p>",
        b"&Idot;stanbul alpha \xc4\xb0",  # flagged page -> Python rerun
        b"",
        b"gamma &#71;AMMA gamma",
    ]
    rows = [("u:a", "alpha"), ("u:bg", "beta gamma"), ("u:g", "gamma")]
    kernels = ["trie", "blocked"] + (["cnative"] if _native_available() else [])
    results = {}
    for k in kernels:
        sel, uris, surfs, nh = make_html_hits_scanner(spark, rows, kernel=k)(htmls)
        results[k] = {
            (int(p), u, s): int(c)
            for p, u, s, c in zip(
                sel.tolist(), uris.to_pylist(), surfs.to_pylist(), nh.tolist()
            )
        }
    want = {
        (0, "u:a", "alpha"): 1,
        (0, "u:bg", "beta gamma"): 1,
        (0, "u:g", "gamma"): 1,
        (1, "u:a", "alpha"): 1,
        (1, "u:bg", "beta gamma"): 1,
        (1, "u:g", "gamma"): 1,
        (2, "u:a", "alpha"): 1,
        (4, "u:g", "gamma"): 3,
    }
    for k in kernels:
        assert results[k] == want, k


def test_agg_scan_overflow_retry_path():
    """The adaptive capacity estimate makes overflow rare, so the retry
    branch (unique pairs > cap -> re-call with the exact count) needs a
    forced exercise: shrink the matcher's rate estimate below the true
    hit density and check results are identical to an ample-capacity run
    on all three aggregated entry points."""
    import pytest

    from ontology_mapping_spark.operators.mentions import _native_available

    if not _native_available():
        pytest.skip("no C compiler on this host")
    from ontology_mapping_spark.native import NativeMatcher, load_entity_table

    rows = [(f"u{i}", w) for i, w in enumerate(["a", "b", "a b", "b a"])]
    texts = [b"a b a b a", b"b a", b""] * 2000  # 6000 pages, ~4 pairs/page
    token_lists = [t.decode().split() for t in texts]
    htmls = [b"<p>" + t + b"</p>" for t in texts]

    def snap(res):
        p, u, c = res
        return sorted(zip(p.tolist(), u.tolist(), c.tolist()))

    ample = NativeMatcher(rows)
    want_text = snap(ample.scan_batch_hits_text(texts))
    want_flat = ample.scan_batch_flat(token_lists)
    assert ample._rate < 16.0  # estimate adapted downward after a batch

    tight = NativeMatcher(rows)
    tight._rate = 0.0  # cap floor 4096 < ~16k unique pairs -> retry fires
    assert snap(tight.scan_batch_hits_text(texts)) == want_text
    assert tight._rate > 0.0  # estimate recovered from the observed rate

    tight._rate = 0.0
    got_flat = tight.scan_batch_flat(token_lists)
    assert got_flat[0].tolist() == want_flat[0].tolist()
    assert [k for k in got_flat[1]] == [k for k in want_flat[1]]
    assert got_flat[2].tolist() == want_flat[2].tolist()

    if load_entity_table() is not None:
        want_html = snap(ample.scan_batch_hits_html(htmls))
        tight._rate = 0.0
        assert snap(tight.scan_batch_hits_html(htmls)) == want_html


def test_gazetteer_crossover_both_sides_identical(spark):
    """detect_mentions switches broadcast-kernel -> blocking-join on
    vocabulary size; both sides of the switch (and the no-hint join past
    the JVM-broadcast budget) must produce identical mention rows, and
    the plan must actually switch (mapInArrow scan vs broadcast join vs
    shuffle join)."""
    from ontology_mapping_spark.operators.mentions import detect_mentions

    pages = spark.createDataFrame(
        [
            ("p1", "the deep gland is near the deeper glands"),
            ("p2", "sub sub sub and deep gland again; deep gland!"),
            ("p3", "nothing relevant here"),
            ("p4", None),
        ],
        "url string, text string",
    )
    phrases = spark.createDataFrame(
        [("u:dg", "deep gland"), ("u:sub", "sub sub"), ("u:dg2", "deep gland")],
        "uri string, phrase string",
    )
    norm = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    kernel = detect_mentions(pages, phrases, broadcast_max_phrases=10)
    join_bc = detect_mentions(pages, phrases, broadcast_max_phrases=0)
    join_shuffle = detect_mentions(
        pages, phrases, broadcast_max_phrases=0, join_broadcast_max_phrases=0
    )
    want = norm(kernel)
    assert want == norm(join_bc) == norm(join_shuffle)
    assert ("p2", "u:sub", "sub sub", 2) in want  # overlap counting intact
    assert {u for _p, u, _s, _n in want} >= {"u:dg", "u:dg2", "u:sub"}
    # the switch is real: kernel side is an Arrow scan (no join); the two
    # join sides differ exactly in the broadcast hint
    kplan = kernel._jdf.queryExecution().executedPlan().toString()
    bplan = join_bc._jdf.queryExecution().executedPlan().toString()
    splan = join_shuffle._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in kplan and "Join" not in kplan
    assert "BroadcastHashJoin" in bplan
    assert "Exchange hashpartitioning(token" not in bplan
    # no static hint: the vocabulary side shuffles on the join key and
    # the strategy is AQE's to pick from runtime sizes (on this tiny
    # fixture it rightly re-broadcasts; at 10M phrases it won't)
    assert "Exchange hashpartitioning(token" in splan and "Join" in splan
