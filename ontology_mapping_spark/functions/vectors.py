"""Embedding + vector-similarity kernels.

The reference embeds concept labels with spaCy ``en_core_web_md``
(thesis/main.py:48-58) and computes cosine similarity with sklearn
(thesis/process_data_features.py:104-105). spaCy is an external model; the
engine's canonical embedding is a deterministic hashed bag-of-words (same
role: a fixed, deterministic map label-text -> dense float vector), computed
in an Arrow-batched pandas UDF. At production scale the UDF body is the one
place a real model (spaCy/transformer, loaded once per executor via a
module-level cache) would slot in — the Spark-side plumbing is identical.

Cosine similarity has two implementations:
* :func:`cosine_col` — pure Catalyst (``aggregate``/``zip_with``), JVM-side,
  for one-off pair scoring inside a wide select;
* :func:`cosine_pairs_udf` — numpy-vectorized pandas UDF (stacked matmul per
  Arrow batch), for bulk scoring where the column-expression version would
  dominate the plan.
Both return 0.0 when either vector is missing (reference semantics,
thesis/process_data_features.py:105).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# deterministic hashed bag-of-words embedding
# ---------------------------------------------------------------------------

def embed_text_py(text: str | None, dim: int = 64) -> list[float]:
    """Deterministic hashed-BoW embedding of a whitespace-tokenized string.

    token -> sha256 -> (index, sign); vector = L2-normalized signed counts.
    Deterministic across processes (no PYTHONHASHSEED dependence).
    """
    vec = np.zeros(dim, dtype=np.float64)
    if text:
        for tok in text.split():
            h = hashlib.sha256(tok.encode("utf-8")).digest()
            idx = int.from_bytes(h[:4], "big") % dim
            sign = 1.0 if h[4] & 1 else -1.0
            vec[idx] += sign
    norm = float(np.linalg.norm(vec))
    if norm > 0:
        vec /= norm
    return [float(x) for x in np.round(vec, 6)]


def make_embed_udf(dim: int = 64):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([embed_text_py(t, dim) for t in texts.tolist()])

    return embed_udf


# ---------------------------------------------------------------------------
# real-model slot: load once per Python worker, embed per Arrow batch
# ---------------------------------------------------------------------------

# worker-side model cache: the UDF closure ships only the SPEC STRING to
# executors; the model itself is loaded lazily inside the worker process on
# first batch and reused for every subsequent batch/task in that worker.
_MODEL_CACHE: dict[str, object] = {}


def _resolve_embedder(spec: str):
    """spec -> callable(list[str]) -> list[vector].

    * ``"spacy:<model>"`` — the reference's exact path (thesis/main.py:48-58):
      ``nlp.pipe(texts, disable=["ner", "parser"])`` -> ``doc.vector``.
    * ``"<module>:<factory>"`` — any importable zero-arg factory returning
      the embed callable (the test seam, and how a sentence-transformer or
      ONNX encoder plugs in without touching this file).
    """
    fn = _MODEL_CACHE.get(spec)
    if fn is not None:
        return fn
    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise ValueError(f"embedder spec must be 'module:attr', got {spec!r}")
    if mod_name == "spacy":
        import spacy

        nlp = spacy.load(attr)

        def fn(texts):
            return [d.vector for d in nlp.pipe(texts, disable=["ner", "parser"])]

    else:
        import importlib

        factory = getattr(importlib.import_module(mod_name), attr)
        fn = factory()
    _MODEL_CACHE[spec] = fn
    return fn


def make_model_embed_udf(spec: str, dim: int):
    """Arrow-batched embedding UDF backed by a real model.

    Same plumbing as :func:`make_embed_udf` (one Python crossing per
    batch); the model loads once per worker process via the module-level
    cache, not once per batch or task. Vectors must come back with
    exactly ``dim`` entries — a silent truncation would corrupt every
    downstream cosine, so dimension mismatch raises."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        embed = _resolve_embedder(spec)
        vecs = embed(["" if t is None else t for t in texts.tolist()])
        out = []
        for v in vecs:
            v = [float(x) for x in v]
            if len(v) != dim:
                raise ValueError(
                    f"embedder {spec!r} returned dim {len(v)}, expected {dim}"
                )
            out.append(v)
        return pd.Series(out)

    return embed_udf


# ---------------------------------------------------------------------------
# cosine similarity
# ---------------------------------------------------------------------------

def cosine_py(v1, v2) -> float:
    """Oracle twin (reference: thesis/process_data_features.py:104-105)."""
    if v1 is None or v2 is None:
        return 0.0
    a = np.asarray(v1, dtype=np.float64)
    b = np.asarray(v2, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def dot_col(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<float> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Catalyst-only cosine; 0.0 on null/zero vectors (reference semantics)."""
    num = dot_col(a, b)
    den = norm_col(a) * norm_col(b)
    return F.when(
        a.isNull() | b.isNull() | (den == 0.0), F.lit(0.0)
    ).otherwise(num / den)


@F.pandas_udf(T.DoubleType())
def cosine_pairs_udf(v1: pd.Series, v2: pd.Series) -> pd.Series:
    """Bulk cosine via one stacked matmul per Arrow batch."""
    out = np.zeros(len(v1), dtype=np.float64)
    # rows must be non-null AND same-dimension, else np.stack raises on a
    # ragged batch (a single corrupt/empty embedding would kill the stage;
    # cosine_py scores such rows 0.0 — keep the twins aligned)
    ok = np.array(
        [
            (a is not None and b is not None and len(a) == len(b) and len(a) > 0)
            for a, b in zip(v1, v2)
        ]
    )
    dims = {len(a) for a, o in zip(v1, ok) if o}
    if len(dims) > 1:  # mixed dims within one batch: score row-by-row
        return pd.Series(
            [cosine_py(a, b) if o else 0.0 for a, b, o in zip(v1, v2, ok)]
        )
    if ok.any():
        a = np.stack([np.asarray(x, dtype=np.float64) for x in v1[ok]])
        b = np.stack([np.asarray(x, dtype=np.float64) for x in v2[ok]])
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(b, axis=1)
        dot = np.einsum("ij,ij->i", a, b)
        denom = na * nb
        nz = denom > 0
        res = np.zeros(ok.sum())
        res[nz] = dot[nz] / denom[nz]
        out[ok] = res
    return pd.Series(out)
