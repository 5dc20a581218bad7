"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

import hashlib

from pyspark.sql import functions as F

from ontology_mapping_spark.operators.dedup import (
    exact_dedup,
    lsh_candidates,
    minhash_signatures,
    near_dup_pairs_minhash,
    near_dup_pairs_simhash,
    ngram_jaccard_pairs,
    simhash,
    token_shingles,
)
from ontology_mapping_spark.textnorm import normalize_py


def py_shingles(text: str, n: int = 3) -> set[str]:
    toks = normalize_py(text).split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def py_minhash(text: str, num_hashes: int = 16, n: int = 3) -> list[str]:
    # md5 number j yields four 32-bit slices (8 hex chars each); slice k of
    # md5(j|shingle) is hash 4j+k — mirrors operators/dedup.minhash_values
    sh = py_shingles(text, n)
    out: list[str] = []
    for j in range((num_hashes + 3) // 4):
        digests = [hashlib.md5(f"{j}|{s}".encode()).hexdigest() for s in sh]
        for k in range(4):
            out.append(min(d[8 * k : 8 * k + 8] for d in digests))
    return out[:num_hashes]


def py_simhash(text: str, bits: int = 16) -> int:
    toks = set(normalize_py(text).split()) - {""}
    votes = [0] * bits
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        for i in range(bits):
            votes[i] += 1 if h[i] in "89abcdef" else -1
    return sum(1 << i for i in range(bits) if votes[i] > 0)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
    (2, "completely different content about spark dataframes and shuffles"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (4, "unrelated text mentioning neither foxes nor rivers at all today"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs_df(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 1, 2, 4]  # 3 deduped against 0


def test_token_shingles_matches_python(spark):
    df = _docs_df(spark).select(
        "doc_id", token_shingles(F.col("text"), 3).alias("sh")
    )
    got = {r["doc_id"]: set(r["sh"]) for r in df.collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == py_shingles(text, 3), doc_id


def test_minhash_signature_matches_python(spark):
    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(_docs_df(spark), num_hashes=8).collect()
    }
    for doc_id, text in DOCS:
        assert sigs[doc_id] == py_minhash(text, 8), doc_id


def test_minhash_lsh_finds_near_dups(spark):
    out = {
        (r["a"], r["b"]): r["jaccard"]
        for r in near_dup_pairs_minhash(
            _docs_df(spark), threshold=0.5, num_hashes=16, bands=8
        ).collect()
    }
    assert (0, 3) in out and out[(0, 3)] == 1.0   # exact dup
    assert (0, 1) in out and 0.5 <= out[(0, 1)] < 1.0  # near dup
    assert not any({a, b} == {0, 2} for a, b in out)


def test_simhash_matches_python_and_finds_dups(spark):
    got = {r["doc_id"]: r["simhash"] for r in simhash(_docs_df(spark)).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == py_simhash(text), doc_id
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in near_dup_pairs_simhash(_docs_df(spark), max_hamming=3).collect()
    }
    assert pairs[(0, 3)] == 0


def test_ngram_jaccard_pairs_matches_python(spark):
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "a long, b long")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs_df(spark), pairs).collect()
    }
    for (a, b), j in got.items():
        sa, sb = py_shingles(DOCS[a][1]), py_shingles(DOCS[b][1])
        assert abs(j - len(sa & sb) / len(sa | sb)) < 1e-12


def test_minhash_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant a near-duplicate of doc 0 and check it is found
    planted = docs.limit(1).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
    )
    all_docs = docs.select("doc_id", "text").unionByName(planted)
    out = near_dup_pairs_minhash(all_docs, threshold=0.6, num_hashes=16, bands=8)
    found = {(r["a"], r["b"]) for r in out.collect()}
    assert (0, 100000) in found


def test_embedding_near_dup_pairs_both_forms(spark):
    import numpy as np
    from ontology_mapping_spark.operators.dedup import near_dup_pairs_embedding

    rng = np.random.default_rng(11)
    base = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(40)]
    # plant near-dups of every 10th vector
    planted = [
        (i + 1000, [x + 0.05 * rng.standard_normal() for x in v])
        for i, v in base
        if i % 10 == 0
    ]
    df = spark.createDataFrame(base + planted, "id long, vec array<double>")

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    all_vecs = dict(base + planted)
    want = {
        (min(i, j), max(i, j))
        for i in all_vecs
        for j in all_vecs
        if i < j and cos(all_vecs[i], all_vecs[j]) >= 0.9
    }
    assert len(want) == 4  # each planted pairs with its source only

    # brute-force probe form: probe side = planted rows
    probe = df.filter(F.col("id") >= 1000)
    got_bf = {
        (min(r["a"], r["b"]), max(r["a"], r["b"]))
        for r in near_dup_pairs_embedding(
            df, threshold=0.9, queries=probe
        ).collect()
    }
    assert got_bf == want

    # LSH-blocked corpus form: subset of truth (recall<1), finds >= 3 of 4
    got_lsh = {
        (min(r["a"], r["b"]), max(r["a"], r["b"]))
        for r in near_dup_pairs_embedding(
            df, threshold=0.9, dim=16, nbits=6, tables=4
        ).collect()
    }
    assert got_lsh <= want and len(got_lsh) >= 3


def test_simhash_wide_bits_and_validation(spark):
    import pytest as _pytest

    # bits > 32 must use real hash bits (second salted digest), not dead
    # zero bits that would collapse LSH bands into one bucket
    got = {r["doc_id"]: r["simhash"] for r in simhash(_docs_df(spark), bits=48).collect()}
    high = {d: v >> 32 for d, v in got.items()}
    assert len(set(high.values())) > 1  # high bits actually vary
    assert got[0] == got[3]             # exact dups still agree
    with _pytest.raises(ValueError):
        simhash(_docs_df(spark), bits=64)
    from ontology_mapping_spark.operators.dedup import near_dup_pairs_minhash as _nd
    with _pytest.raises(ValueError):
        _nd(_docs_df(spark), num_hashes=16, bands=5)


def test_lsh_candidates_rejects_non_divisor_bands(spark):
    # direct lsh_candidates callers (bypassing near_dup_pairs_minhash's
    # eager check) must fail loudly, not silently drop trailing hashes
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    sigs = minhash_signatures(_docs_df(spark), num_hashes=8)
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        lsh_candidates(sigs, bands=3).collect()
    with pytest.raises(ValueError):
        lsh_candidates(sigs, bands=0)
    # divisor bands still fine
    assert lsh_candidates(sigs, bands=4).count() >= 0


def test_containment_pairs_planted_substring(spark):
    """A document embedded in another shares (nearly) all its winnow
    fingerprints: containment == 1.0 for the planted prefix pair, and the
    unrelated filler pair never reaches min_shared."""
    from pyspark.sql import functions as F

    from ontology_mapping_spark.operators.dedup import containment_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long and winding tune about distributed joins and shuffle keys "
        "that must never explode quadratically on a hot token"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base[:80]),  # embedded prefix
            (3, "completely different filler text with no overlap at all zzz qqq"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]): (r["shared_fps"], r["containment"])
        for r in containment_pairs(docs, min_shared=3).collect()
    }
    assert (1, 2) in got
    shared, cont = got[(1, 2)]
    assert cont == 1.0 and shared >= 3
    assert all(3 not in pair for pair in got)

    # max_fp_df drops boilerplate fingerprints: capping at 1 (every fp in
    # both docs is dropped) must erase the pair
    assert (
        containment_pairs(docs, min_shared=3, max_fp_df=1).count() == 0
    )


def test_canonical_url_twins_agree(spark):
    """Catalyst canonical_url_col == canonical_url_py on messy URLs
    covering every canonicalization step and the pass-through cases."""
    from pyspark.sql import functions as F

    from ontology_mapping_spark.functions.strings import (
        canonical_url_col,
        canonical_url_py,
    )

    urls = [
        "HTTPS://WWW.Example3.COM:443/path/5/?utm_source=feed&id=2&utm_campaign=x#sec",
        "http://Host.com:80/",
        "http://host.com",
        "https://host.com/a/b/?fbclid=z",
        "https://host.com/?ref=1&q=2",
        "https://host.com:8443/x/",
        "http://a.com/p?x=1&utm_medium=m&y=2&gclid=g",
        "HTTP://WWW.A.COM:80?utm_source=s",
        "ftp://X/",
        "relative/path/?utm_source=x",
        "https://host.com/p//",
        "https://host.com/p?&&x=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url_col(F.col("url")).alias("c")).collect()
    }
    for u in urls:
        assert got[u] == canonical_url_py(u), (u, got[u], canonical_url_py(u))


def test_url_dedup_keeps_min_id_per_canonical(spark):
    from ontology_mapping_spark.operators.dedup import url_dedup

    df = spark.createDataFrame(
        [
            (3, "https://a.com/x?utm_source=1"),
            (1, "HTTPS://WWW.A.com/x/"),
            (2, "https://a.com/x#frag"),
            (9, "https://b.com/y"),
        ],
        "doc_id long, url string",
    )
    got = {(r["doc_id"], r["url_canon"]) for r in url_dedup(df).collect()}
    assert got == {(1, "https://a.com/x"), (9, "https://b.com/y")}


def test_canonical_url_twins_agree_property(spark):
    """Hypothesis sweep over URL-shaped noise: the Catalyst regex chain
    (Java Pattern) and the Python twin (re) must agree on arbitrary
    inputs, not just well-formed URLs — the dialect-divergence guard."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from ontology_mapping_spark.functions.strings import (
        canonical_url_col,
        canonical_url_py,
    )

    frag = st.sampled_from(
        [
            "http://", "HTTPS://", "www.", "Host7", ".com", ":443", ":80",
            ":8080", "/", "/Path", "?", "&", "utm_source=x", "id=2",
            "ref=1", "fbclid=", "#frag", "a.b", "-", "_", "%20", "=",
        ]
    )
    urls = st.lists(frag, min_size=0, max_size=8).map("".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(urls, min_size=1, max_size=20))
    def check(batch):
        df = spark.createDataFrame([(u,) for u in batch], "url string")
        rows = df.select("url", canonical_url_col(F.col("url")).alias("c")).collect()
        for r in rows:
            assert r["c"] == canonical_url_py(r["url"]), r["url"]

    check()


def test_line_dedup_keep_first_and_short_exempt(spark):
    from ontology_mapping_spark.operators.dedup import line_dedup

    boiler = "SHARED NAVIGATION BANNER LINE"
    rows = [
        (1, boiler + "\nunique first body line of one\nok", "a"),
        # doc 2 repeats the boiler line (drops) and doc 1's body (drops),
        # keeps its own line and the short "ok" (exempt, < min_chars)
        (2, boiler + "\nunique first body line of one\nsecond doc own line\nok", "b"),
        # within-doc duplicate line: second copy drops
        (3, "third doc repeated line here\nthird doc repeated line here", "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tag string")
    out = {r["doc_id"]: r for r in line_dedup(df, min_chars=10).collect()}
    assert out[1]["text"] == boiler + "\nunique first body line of one\nok"
    assert out[2]["text"] == "second doc own line\nok"
    assert out[3]["text"] == "third doc repeated line here"
    assert (out[2]["n_lines_kept"], out[2]["n_lines_total"]) == (2, 4)
    assert out[3]["n_lines_kept"] == 1 and out[3]["n_lines_total"] == 2
    # untouched columns pass through
    assert out[1]["tag"] == "a"


def test_line_dedup_all_lines_removed_yields_empty_text(spark):
    from ontology_mapping_spark.operators.dedup import line_dedup

    rows = [
        (1, "only one long shared line everywhere"),
        (2, "only one long shared line everywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in line_dedup(df).collect()}
    assert out == {1: "only one long shared line everywhere", 2: ""}


def test_decontaminate_shared_13gram_and_short_exact_copy(spark):
    from ontology_mapping_spark.operators.dedup import (
        contaminated_doc_ids,
        decontaminate,
    )

    eval_gram = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                 "juliett kilo lima mike")  # exactly 13 tokens
    short_eval = "tiny eval answer"
    evald = spark.createDataFrame(
        [(100, "question context " + eval_gram + " more eval text"),
         (101, short_eval)],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [
            # contains the eval 13-gram mid-document -> drops
            (1, "some train prefix " + eval_gram + " and a train suffix"),
            # clean -> survives
            (2, "completely unrelated training document body with many words"),
            # exact copy of the SHORT eval doc (under 13 tokens) -> caught
            # via the whole-text fallback shingle
            (3, short_eval),
            # shares only a 12-token window (one word changed) -> survives
            (4, "alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliett kilo lima DIFFERENT"),
        ],
        "doc_id long, text string")
    bad = sorted(r["doc_id"] for r in contaminated_doc_ids(train, evald).collect())
    assert bad == [1, 3]
    clean = sorted(r["doc_id"] for r in decontaminate(train, evald).collect())
    assert clean == [2, 4]


def test_dedup_null_keys_pass_through(spark):
    """A NULL dedup key means "unknown", not "equal": NULL-text /
    NULL-url rows must all survive (the NULL window partition would
    otherwise keep one and silently delete the rest)."""
    from ontology_mapping_spark.operators.dedup import url_dedup

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)],
        "doc_id int, text string",
    )
    kept = sorted(r.doc_id for r in exact_dedup(df).collect())
    assert kept == [1, 3, 4, 5]

    urls = spark.createDataFrame(
        [
            (1, "http://a.com/x"),
            (2, "HTTP://A.com/x/"),
            (3, None),
            (4, None),
        ],
        "doc_id int, url string",
    )
    kept_u = sorted(r.doc_id for r in url_dedup(urls).collect())
    assert kept_u == [1, 3, 4]


def test_simhash_keeps_empty_and_null_docs(spark):
    """Every input row gets a signature: empty/punctuation-only/NULL
    text votes nothing and fingerprints as 0 — dropping the row would
    lose the document from any signature join."""
    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, ""), (2, "!!!"), (3, None)],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[1] == got[2] == got[3] == 0
    assert got[0] != 0


def test_simhash_band_pigeonhole_validation(spark):
    """bits/band_bits must exceed max_hamming or the pigeonhole
    guarantee silently breaks (a within-threshold pair sharing no band
    is never a candidate); ragged bands are rejected too."""
    import pytest

    df = _docs_df(spark)
    with pytest.raises(ValueError, match="exceed max_hamming"):
        near_dup_pairs_simhash(df, bits=16, band_bits=8, max_hamming=2)
    with pytest.raises(ValueError, match="must divide"):
        near_dup_pairs_simhash(df, bits=16, band_bits=5)
    with pytest.raises(ValueError, match="must divide"):
        near_dup_pairs_simhash(df, bits=16, band_bits=32)  # non-divisor too
    with pytest.raises(ValueError, match="exceed max_hamming"):
        # divides, but 16/16 = 1 band <= max_hamming: zero-overlap pairs
        near_dup_pairs_simhash(df, bits=16, band_bits=16, max_hamming=2)


def test_lsh_candidates_rejects_empty_signatures(spark):
    """size(sig)=0 passes the divisibility check (0 % bands == 0) but
    every empty-sig row would hash md5('') in EVERY band — the exact
    cross-product blowup the guard exists to prevent. Loud error."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    sigs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, [])], "doc_id int, sig array<string>"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        lsh_candidates(sigs, bands=2).collect()


def test_embedding_query_overlap_emits_each_pair_once(spark):
    """When the query batch overlaps the corpus (incremental dedup after
    append), a near-dup pair with both ids on both sides must come out
    in ONE orientation (a < b), not both — the drop-the-b-side consumer
    would otherwise delete both copies. Pairs whose mirror is not
    produced keep their probe orientation."""
    from ontology_mapping_spark.operators.dedup import near_dup_pairs_embedding

    v = [1.0, 0.0, 0.0]
    corpus = spark.createDataFrame(
        [(1, v), (2, v), (9, [0.0, 1.0, 0.0])], "id int, vec array<float>"
    )
    # full overlap: queries == corpus
    pairs = {
        (r.a, r.b)
        for r in near_dup_pairs_embedding(
            corpus, queries=corpus, threshold=0.9
        ).collect()
    }
    assert pairs == {(1, 2)}
    # query id NOT in the corpus: probe orientation kept even when a > b
    q = spark.createDataFrame([(7, v)], "id int, vec array<float>")
    pairs2 = {
        (r.a, r.b)
        for r in near_dup_pairs_embedding(
            corpus, queries=q, threshold=0.9
        ).collect()
    }
    assert pairs2 == {(7, 1), (7, 2)}
