"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk_bruteforce` — exact baseline: query × corpus join with
  a JVM-side cosine (zip_with/aggregate) and a per-query top-k window.
  O(|Q|·|C|); correct at any scale where |Q| is small (the scoring join is
  a broadcast of the queries, so the corpus is scanned once).
* :func:`sign_lsh_buckets` / :func:`ann_lsh_topk` — random-hyperplane
  (sign) LSH: deterministic hyperplanes drawn on the driver from a seeded
  RNG, broadcast as literals; bucket = sign-bit string; candidates share a
  bucket in >= 1 of ``tables`` independent tables; exact cosine re-rank.
* :func:`ann_ivf_topk` — IVF: KMeans coarse quantizer, each corpus vector
  assigned to its nearest centroid; a query probes its ``nprobe`` closest
  centroids and re-ranks exactly within them. The scale path: the probe is
  an equi-join on centroid id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ontology_mapping_spark.functions.vectors import cosine_col, dot_col, norm_col


def _topk(scored: DataFrame, k: int, q: str = "q_id", score: str = "cos") -> DataFrame:
    w = Window.partitionBy(q).orderBy(F.col(score).desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q, "c_id", score, "rank")
    )


def cosine_topk_bruteforce(
    queries: DataFrame,  # (q_id, vec)
    corpus: DataFrame,   # (c_id, vec)
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: (q_id, c_id, cos, rank).

    Norms are precomputed per SIDE (|Q| + |C| array passes) instead of
    per PAIR inside cosine_col (|Q| × |C|) — the dot product is the only
    per-pair array pass left. Same 0.0-on-null/zero semantics as
    cosine_col: a NULL vector's norm is NULL, so the positive-denominator
    test fails and the pair scores 0.0."""
    q = queries.select(
        F.col("q_id"), F.col("vec").alias("qv"), norm_col(F.col("vec")).alias("nq")
    )
    c = corpus.select(
        F.col("c_id"), F.col("vec").alias("cv"), norm_col(F.col("vec")).alias("nc")
    )
    scored = F.broadcast(q).crossJoin(c).withColumn(
        "cos", _cos_from_norms("qv", "cv", "nq", "nc")
    )
    return _topk(scored, k)


def _cos_from_norms(qv: str, cv: str, nq: str, nc: str):
    """cosine from precomputed per-side norms; 0.0 on null/zero vectors
    (cosine_col's reference semantics, one array pass per pair)."""
    den = F.col(nq) * F.col(nc)
    return F.when(den > 0, dot_col(F.col(qv), F.col(cv)) / den).otherwise(0.0)


def _hyperplanes(dim: int, nbits: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, nbits, dim))


def sign_lsh_buckets(
    df: DataFrame,
    id_col: str,
    dim: int,
    nbits: int = 8,
    tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(id, table, bucket): sign-bit bucket per hash table. Hyperplane dot
    products are pure Catalyst (aggregate over zip_with against literal
    arrays) — no Python in the hot path.

    All tables come out of ONE scan: each row computes its (table,
    bucket) structs side by side and explodes them, instead of a
    plan-level union of per-table selects — the union form re-scanned
    (and re-projected the embedding column of) the input once per
    table.

    ``dim`` is validated IN-PLAN against each row's actual vector length:
    a mismatch (the caller must pass dim manually, so an easy mistake)
    would otherwise make zip_with pad with nulls, every dot NULL, every
    bit '0' — ALL vectors in one bucket per table, silently collapsing
    the candidate join to the full cross product. Better a loud error on
    the first row than an O(n²) scale collapse with no symptom."""
    planes = _hyperplanes(dim, nbits, tables, seed)
    vec_type = dict(df.dtypes)["vec"]
    # a NULL vector keeps its legacy all-zero bucket (dots NULL -> bits
    # '0'); only a present-but-wrong-length vector is an error
    vec = F.when(
        F.col("vec").isNull() | (F.size(F.col("vec")) == dim), F.col("vec")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"sign_lsh_buckets: dim={dim} but vector has length "),
                F.size(F.col("vec")).cast("string"),
            )
        ).cast(vec_type)
    )
    per_table = []
    for t in range(tables):
        bits = []
        for b in range(nbits):
            lit_vec = F.array(*[F.lit(float(x)) for x in planes[t, b]])
            dot = F.aggregate(
                F.zip_with(vec, lit_vec, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        per_table.append(
            F.struct(
                F.lit(t).alias("table"), F.concat(*bits).alias("bucket")
            )
        )
    return df.select(
        F.col(id_col), F.explode(F.array(*per_table)).alias("_tb")
    ).select(F.col(id_col), F.col("_tb.table"), F.col("_tb.bucket"))


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 8,
    tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any table, then
    exact cosine re-rank. Recall < 1 by construction; raise ``tables`` or
    lower ``nbits`` for higher recall."""
    qb = sign_lsh_buckets(queries.select(F.col("q_id").alias("id"), "vec"), "id", dim, nbits, tables, seed)
    cb = sign_lsh_buckets(corpus.select(F.col("c_id").alias("id"), "vec"), "id", dim, nbits, tables, seed)
    cands = (
        qb.select(F.col("id").alias("q_id"), "table", "bucket")
        .join(cb.select(F.col("id").alias("c_id"), "table", "bucket"), ["table", "bucket"])
        .select("q_id", "c_id")
        .distinct()
    )
    scored = (
        cands.join(
            queries.select(
                "q_id",
                F.col("vec").alias("qv"),
                norm_col(F.col("vec")).alias("nq"),
            ),
            "q_id",
        )
        .join(
            corpus.select(
                "c_id",
                F.col("vec").alias("cv"),
                norm_col(F.col("vec")).alias("nc"),
            ),
            "c_id",
        )
        # per-side norms (computed on the join inputs, once per row), not
        # per-pair inside cosine_col — same 0.0-on-null/zero semantics
        .withColumn("cos", _cos_from_norms("qv", "cv", "nq", "nc"))
    )
    return _topk(scored, k)


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF: coarse-quantize the corpus; a query scans only its ``nprobe``
    nearest inverted lists. Returns (q_id, c_id, cos, rank).

    Quantizer: KMeans by default; pass ``centroids`` (list_id, center) to
    use a fixed codebook instead (e.g. a deterministic data sample — the
    standard cheap init, and exactly reproducible across engines, which
    the SQL oracle relies on)."""
    spark = corpus.sparkSession
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        from ontology_mapping_spark.functions.arrays import bind
        from ontology_mapping_spark.functions.vectors import norm_col

        # KMeans assigns by Euclidean distance while probing ranks by
        # cosine — fit and assign on L2-NORMALIZED copies so the two
        # metrics agree (on the unit sphere, nearest-Euclidean ==
        # nearest-cosine); the stored vec stays raw for exact re-ranking.
        # vec and its norm are lambda-bound so the per-element division
        # doesn't re-derive the norm (HOF trap, see functions/arrays).
        vecd = F.transform(F.col("vec"), lambda x: x.cast("double"))
        unit = bind(
            F.struct(vecd.alias("v"), norm_col(vecd).alias("n")),
            lambda s: F.when(
                s["n"] > 0, F.transform(s["v"], lambda x: x / s["n"])
            ).otherwise(s["v"]),
        )
        corpus_v = corpus.select(
            "c_id", "vec", array_to_vector(unit).alias("fv")
        )
        km = KMeans(
            k=n_centroids, seed=seed, featuresCol="fv", predictionCol="list_id"
        )
        model = km.fit(corpus_v)
        assigned = model.transform(corpus_v).select("c_id", "vec", "list_id")
        centers = model.clusterCenters()
        centers_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            "list_id int, center array<double>",
        )
    else:
        centers_df = centroids.select("list_id", "center")
        wa = Window.partitionBy("c_id").orderBy(
            F.col("adist").desc(), F.col("list_id")
        )
        assigned = (
            corpus.crossJoin(F.broadcast(centers_df))
            .withColumn("adist", cosine_col(F.col("vec"), F.col("center")))
            .withColumn("ar", F.row_number().over(wa))
            .filter(F.col("ar") == 1)
            .select("c_id", "vec", "list_id")
        )
    # query -> nprobe nearest centroids (centroid table is tiny: broadcast)
    q_centers = (
        F.broadcast(centers_df)
        .crossJoin(queries.select("q_id", F.col("vec").alias("qv")))
        .withColumn("cdist", cosine_col(F.col("qv"), F.col("center")))
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("cdist").desc(), F.col("list_id"))
    probes = (
        q_centers.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("q_id", "qv", "list_id")
    )
    scored = probes.join(assigned, "list_id").withColumn(
        "cos", cosine_col(F.col("qv"), F.col("vec"))
    )
    return _topk(scored, k)
