"""Golden-hash contract: normalize_col (Catalyst) == normalize_py (oracle),
byte-identical per row (BASELINE.json input_hint invariant)."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ontology_mapping_spark.textnorm import extract_text_py, normalize_col, normalize_py


def sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def test_normalize_py_reference_semantics():
    # thesis/process_data_features.py:183-187 behavior
    assert normalize_py("Hello, World!") == "hello world"
    assert normalize_py("  a   b  ") == "a b"
    assert normalize_py("α-Receptor (type 2)") == "receptor type 2"
    assert normalize_py("") == ""
    assert normalize_py(None) == ""
    assert normalize_py("ABC123") == "abc123"


def test_normalize_golden_hash_fixture_corpus(spark, fx_dfs):
    pages = fx_dfs["pages"]
    got = (
        pages.select("url", F.sha2(normalize_col("text"), 256).alias("h"))
        .orderBy("url")
        .collect()
    )
    rows = pages.select("url", "text").orderBy("url").collect()
    want = {r["url"]: sha(normalize_py(r["text"])) for r in rows}
    assert len(got) > 0
    for r in got:
        assert r["h"] == want[r["url"]], r["url"]


def test_normalize_golden_hash_unicode_edge_cases(spark):
    cases = [
        "tab\tand\nnewline",
        "nbsp space",
        "greek αβγ",
        "quotes “x” ‘y’",
        "mixed – dash—here",
        "UPPER lower 42",
        " ",
        "   ",
        "a,b;c.d",
        "ideographic　space",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r["n"] for r in df.select(normalize_col("s").alias("n")).collect()]
    want = [normalize_py(c) for c in cases]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_normalize_py_idempotent(s):
    once = normalize_py(s)
    assert normalize_py(once) == once


def test_extract_text_strips_boilerplate():
    html = (
        b"<html><head><script>junk()</script><style>b{}</style></head>"
        b"<body><nav>menu</nav><!-- c --><main><p>Real &amp; true</p></main>"
        b"<footer>foot</footer></body></html>"
    )
    assert extract_text_py(html) == "Real & true"
    assert extract_text_py(None) == ""


def test_extract_text_matches_fixture_ground_truth(fx):
    # html embeds the ground-truth text inside boilerplate; extraction must
    # recover it byte-identically (golden-hash per url)
    for p in fx.web_pages[:50]:
        assert extract_text_py(p["html"]) == p["text"], p["url"]


def test_fused_tokenizer_matches_golden_path(fx):
    # tokens_from_html_py must emit exactly the token stream of
    # normalize(extract(html)).split() — the fused kernel may not drift
    from ontology_mapping_spark.textnorm import tokens_from_html_py

    for p in fx.web_pages[:100]:
        expect = normalize_py(extract_text_py(p["html"])).split()
        assert tokens_from_html_py(p["html"]) == expect, p["url"]
    # unicode / entity / byte edge cases
    cases = [
        b"<p>caf\xc3\xa9 &amp; Na\xc3\xafve &lt;tag&gt; A1</p>",
        b"<script>skip me</script>Keep <b>Bold</b> &#65;&#66;",
        b"\xff\xfe broken utf8 <i>ok</i>",
        None,
        b"",
    ]
    for html in cases:
        expect = normalize_py(extract_text_py(html)).split()
        assert tokens_from_html_py(html) == expect, html


@given(
    st.binary(max_size=400)
    | st.text(max_size=300).map(lambda s: s.encode("utf-8"))
)
@settings(max_examples=300, deadline=None)
def test_fused_tokenizer_property(html):
    # property: the fused tokenizer equals the golden normalize+extract
    # token stream on ARBITRARY byte input (both regex and ASCII paths)
    from ontology_mapping_spark.textnorm import tokens_from_html_py

    assert tokens_from_html_py(html) == normalize_py(extract_text_py(html)).split()
