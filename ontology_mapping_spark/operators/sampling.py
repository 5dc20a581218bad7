"""Deterministic sampling + canonical pair ordering.

The reference's negative sampling uses ``random.sample`` over Python sets
(thesis/generate_candidates.py:27,127,144) — order depends on the process
hash seed, so exact negative sets are not reproducible across runs. The
engine's canonical sampler orders candidates by a salted 64-bit hash and
takes the first n per group (SURVEY.md §2.5): same inputs + same seed ->
byte-identical sample, on any cluster size. The pytest oracle implements
the identical rule in pure Python (xxhash64 is Spark-side; the oracle uses
the Spark-computed hashes via the engine itself for cross-checks, and
md5-ordered variants are used where an external oracle must agree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def canonical_pair(a: Column | str, b: Column | str) -> tuple[Column, Column]:
    """Symmetric pair canonicalization (reference: tuple(sorted([c1, c2])),
    thesis/generate_candidates.py:14-15,19)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.least(a, b), F.greatest(a, b)


def _sample_order_key(hash_cols: list[str], seed: int) -> Column:
    """md5 over an INJECTIVELY encoded key: each part is length-prefixed
    (``len:value``, nulls -> ``N``) so delimiter-bearing or null values
    cannot make two distinct rows tie — a tie would leave the "canonical
    deterministic sample" partition-order dependent (same encoding as
    sources/readers.mint_uri)."""
    strs = [F.col(c).cast("string") for c in hash_cols]
    encoded = [
        F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )
        for s in strs
    ]
    return F.md5(F.concat_ws("|", *encoded, F.lit(str(seed))))


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    hash_cols: list[str],
    n: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-group sample of up to ``n`` rows.

    Orders rows within each group by a salted md5 key — md5 rather than
    xxhash64 so an external (DuckDB/pure-Python) oracle can reproduce the
    exact sample. Spark >=3.5 rewrites the row_number filter into a
    per-partition group-limit (InferWindowGroupLimit): no full sort of
    each group.
    """
    w = Window.partitionBy(*group_cols).orderBy(_sample_order_key(hash_cols, seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def sample_global(df: DataFrame, hash_cols: list[str], n: int, seed: int = 42) -> DataFrame:
    """Deterministic global cap: order by salted md5, take first n
    (TakeOrderedAndProject — distributed top-n, no single-partition sort).
    Re-expresses ``random.sample(negatives, k=max_negatives)``
    (thesis/generate_candidates.py:26-27) deterministically.
    """
    return df.orderBy(_sample_order_key(hash_cols, seed)).limit(n)


def md5_sample_key_py(parts: list[str], seed: int = 42) -> str:
    """Pure-Python twin of the sampler's ordering key."""
    import hashlib

    enc = ["N" if p is None else f"{len(p)}:{p}" for p in parts]
    return hashlib.md5(("|".join(enc + [str(seed)])).encode()).hexdigest()


def mixture_uniform(hash_cols: list[str], seed: int = 42) -> Column:
    """Deterministic uniform in [0, 1): the top 52 bits of the salted
    injective md5 key (13 hex chars — exactly representable as a double,
    so engine and any md5-capable oracle agree bit-for-bit). Same key
    encoding as :func:`_sample_order_key`."""
    key = _sample_order_key(hash_cols, seed)
    return F.conv(F.substring(key, 1, 13), 16, 10).cast("double") / float(1 << 52)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    hash_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Training-mixture sampling: keep each row of source ``s`` with
    probability ``rates[s]`` (sources absent from ``rates`` drop). The
    keep decision is a pure projection over a salted md5 of ``hash_cols``
    (default: the source col plus nothing row-unique — pass the id col!),
    so the sample is byte-identical across runs, cluster sizes, and
    retries, and the operator is a zero-shuffle filter at any scale —
    the standard domain-reweighting step in front of a pretraining run.
    """
    if hash_cols is None:
        raise ValueError("pass hash_cols (e.g. ['doc_id']): the uniform "
                         "must be keyed on row identity, not randomness")
    rate_map = F.create_map(
        *[F.lit(x) for kv in sorted(rates.items()) for x in kv]
    )
    u = mixture_uniform(hash_cols, seed)
    rate = F.coalesce(F.element_at(rate_map, F.col(source_col)), F.lit(0.0))
    return df.filter(u < rate)
