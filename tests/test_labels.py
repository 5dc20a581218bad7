"""Label extraction vs oracle (thesis/process_data_features.py:12-24)."""

from ontology_mapping_spark.operators.labels import extract_labels, label_text
from ontology_mapping_spark.textnorm import normalize_py
from tests import oracle


def test_extract_labels_matches_oracle(spark, fx, fx_dfs):
    got = {
        r["uri"]: list(r["labels"])
        for r in extract_labels(fx_dfs["triples"]).collect()
    }
    want = oracle.extract_labels(fx.triples)
    assert got == want


def test_label_text_matches_oracle(spark, fx, fx_dfs):
    labels_df = extract_labels(fx_dfs["triples"])
    got = {r["uri"]: r["text"] for r in label_text(labels_df).collect()}
    want = {
        u: normalize_py(" ".join(ls))
        for u, ls in oracle.extract_labels(fx.triples).items()
    }
    assert got == want


def test_side_tagging(spark, fx_dfs):
    sides = {
        r["side"] for r in extract_labels(fx_dfs["triples"]).select("side").distinct().collect()
    }
    assert sides == {"src", "tgt"}
