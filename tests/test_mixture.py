"""mixture_sample: deterministic domain-reweighting sampling."""

from __future__ import annotations

import hashlib

import pytest

from ontology_mapping_spark.operators.sampling import mixture_sample


def _expected_keep(doc_id: int, rate: float, seed: int = 42) -> bool:
    """Pure-Python twin of the engine's 52-bit md5 uniform."""
    s = str(doc_id)
    h = hashlib.md5(f"{len(s)}:{s}|{seed}".encode()).hexdigest()
    return int(h[:13], 16) / float(1 << 52) < rate


def test_mixture_sample_matches_pure_python_oracle(spark):
    rates = {"web": 0.7, "wiki": 0.25}
    rows = [(i, "web" if i % 3 else "wiki") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(r["doc_id"] for r in
                 mixture_sample(df, rates, hash_cols=["doc_id"]).collect())
    want = sorted(i for i, s in rows if _expected_keep(i, rates[s]))
    assert got == want
    assert 0 < len(got) < 400


def test_mixture_sample_unlisted_source_drops_and_rate_one_keeps(spark):
    rows = [(i, "keepall" if i < 50 else "unlisted") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(r["doc_id"] for r in
                 mixture_sample(df, {"keepall": 1.0}, hash_cols=["doc_id"]).collect())
    assert got == list(range(50))


def test_mixture_sample_requires_hash_cols(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="hash_cols"):
        mixture_sample(df, {"a": 0.5})
