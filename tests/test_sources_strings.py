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


# ---- real-model embedding slot (functions/vectors.py) --------------------

def test_model_embed_udf_loads_once_per_worker(spark):
    from ontology_mapping_spark.functions.vectors import make_model_embed_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "banana" if i % 2 else "kiwi") for i in range(40)], "id long, text string"
    ).repartition(4)
    udf = make_model_embed_udf("tests.fake_model:factory", dim=8)
    rows = df.select("id", "text", udf(F.col("text")).alias("vec")).collect()
    by_text = {r["text"]: list(r["vec"]) for r in rows}
    assert by_text["banana"][:2] == [6.0, 3.0]
    assert by_text["kiwi"][:2] == [4.0, 0.0]
    assert all(len(r["vec"]) == 8 for r in rows)
    # second query through the same workers: the worker-side cache serves
    # the model (LOADS is per worker process; repeated queries must not
    # multiply it). Probe the per-worker count from inside the workers.
    df.select(udf(F.col("text")).alias("v")).collect()
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.IntegerType())
    def loads_probe(x: pd.Series) -> pd.Series:
        import tests.fake_model as fm

        return pd.Series([fm.LOADS] * len(x))

    loads = {r[0] for r in df.select(loads_probe(F.col("id"))).collect()}
    # every worker that embedded loaded exactly once (0 allowed: a probe
    # task can land on a fresh worker that never ran the embed UDF)
    assert loads <= {0, 1}


def test_model_embed_udf_dim_mismatch_raises(spark):
    from ontology_mapping_spark.functions.vectors import make_model_embed_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("x",)], "text string")
    udf = make_model_embed_udf("tests.fake_model:factory", dim=5)
    import pytest

    with pytest.raises(Exception, match="dim"):
        df.select(udf(F.col("text"))).collect()


def test_model_embed_udf_spacy_when_present(spark):
    """Runs the reference's actual spaCy path when the model ships;
    skips cleanly in this container (no spacy)."""
    import pytest

    spacy = pytest.importorskip("spacy")
    try:
        spacy.load("en_core_web_md")
    except OSError:
        pytest.skip("en_core_web_md not downloaded")
    from ontology_mapping_spark.functions.vectors import make_model_embed_udf
    from pyspark.sql import functions as F

    udf = make_model_embed_udf("spacy:en_core_web_md", dim=300)
    df = spark.createDataFrame([("left lung",), ("kidney",)], "text string")
    rows = df.select(udf(F.col("text")).alias("vec")).collect()
    assert all(len(r["vec"]) == 300 for r in rows)
    assert any(any(abs(x) > 0 for x in r["vec"]) for r in rows)


def test_nltk_seam_raises_cleanly_without_nltk():
    # nltk is absent in this container: the seam must fail at plan time
    # with ImportError (not inside an executor task), and the fallback
    # tokenizer stays available
    import pytest

    from ontology_mapping_spark.functions.strings import make_nltk_udfs, tokenize_py

    try:
        import nltk  # noqa: F401

        pytest.skip("nltk present; covered by test_nltk_seam_when_present")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        make_nltk_udfs()
    assert tokenize_py("Left-lung, base") == ["left", "-", "lung", ",", "base"]


def test_nltk_seam_when_present(spark):
    """Exercises the real NLTK kernels through Spark when the lib ships;
    skips cleanly here."""
    import pytest

    pytest.importorskip("nltk")
    from pyspark.sql import functions as F

    from ontology_mapping_spark.functions.strings import make_nltk_udfs

    try:
        tok_udf, stem_udf, lem_udf = make_nltk_udfs()
    except LookupError:
        # the plan-time probe found the lib but not its corpora — that
        # loud early failure is exactly the contract; skip the drive
        pytest.skip("nltk present but corpora not downloaded")
    df = spark.createDataFrame([("running shoes",)], "text string")
    row = df.select(
        tok_udf(F.col("text")).alias("toks"),
        stem_udf(F.col("text")).alias("stem"),
    ).collect()[0]
    assert row["toks"] == ["running", "shoes"]
    assert row["stem"].startswith("run")
