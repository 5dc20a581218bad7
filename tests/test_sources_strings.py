"""Typed readers, URI minting, accent folding, tokenizer fallback."""

from pyspark.sql import functions as F

from ontology_mapping_spark.functions.strings import fold_accents_py, tokenize_py
from ontology_mapping_spark.sources.readers import mint_uri, read_alignments


def test_read_alignments_tsv(spark, tmp_path):
    p = tmp_path / "align.tsv"
    p.write_text(
        "SrcEntity\tTgtEntity\tScore\n"
        "src:A\ttgt:A\t1.0\n"
        "src:B\ttgt:B\t0.4\n"
    )
    df = read_alignments(spark, str(p))
    rows = {r["SrcEntity"]: (r["Score"], r["Label"]) for r in df.collect()}
    assert rows == {"src:A": (1.0, 1), "src:B": (0.4, 0)}
    pos = read_alignments(spark, str(p), positives_only=True)
    assert [tuple(r) for r in pos.collect()] == [("src:A", "tgt:A")]


def test_mint_uri_deterministic(spark):
    df = spark.createDataFrame([("x", "y"), ("x", "y"), ("x", "z")], "a string, b string")
    out = [r["m"] for r in df.select(mint_uri("kg:", "a", "b").alias("m")).collect()]
    assert out[0] == out[1] != out[2]
    assert out[0].startswith("kg:") and len(out[0]) == 3 + 40


def test_fold_accents():
    assert fold_accents_py("émigré naïve São") == "emigre naive Sao"
    assert fold_accents_py("plain") == "plain"


def test_tokenize_fallback():
    assert tokenize_py("Hello, world! x2") == ["hello", ",", "world", "!", "x2"]


def test_mint_uri_injective_encoding(spark):
    # delimiter-bearing values and nulls must not collide (length-prefix +
    # null marker encoding)
    df = spark.createDataFrame(
        [("a|b", "c"), ("a", "b|c"), ("a", None), (None, "a"), ("a", "")],
        "a string, b string",
    )
    out = [r["m"] for r in df.select(mint_uri("kg:", "a", "b").alias("m")).collect()]
    assert len(set(out)) == 5
