"""Pairwise feature computation — the wide join of SURVEY.md §3/EP3.

Re-expresses ``compute_features`` (thesis/process_data_features.py:111-180)
as ONE declarative select over
``pairs ⋈ label_text ×2 ⋈ embeddings ×2 ⋈ depths ×2 ⋈ closure aggregates``,
with exactly two pandas-UDF columns (partial ratio, cosine) — everything
else is Catalyst built-ins inside whole-stage codegen.

Feature columns (reference name -> engine alias):
  Shared Tokens Count         shared_tokens_count     (:158,164)
  Token Ratio C1/C2           token_ratio_c1/_c2      (:165-166)
  Exact String Match          exact_string_match      (:167)
  Partial String Match        partial_string_match    (:168)
  Weighted Jaccard            weighted_jaccard        (:169, token_jaccard :107-109)
  Cosine Similarity           cosine_similarity       (:170, cosine_sim :104-105)
  Levenshtein Distance        levenshtein_distance    (:171)
  Depth Difference            depth_difference        (:172)
  Norm Depth Difference       norm_depth_difference   (:155, norm_depth :131-138)
  Ancestor Jaccard Similarity ancestor_jaccard        (:152-154)

Rows with missing/NaN embeddings are skipped (:150-151). The ablation
variant (compute_features_ablation, :35-96) drops the three token-stat
columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig
from ontology_mapping_spark.functions.fuzzy import partial_ratio_udf
from ontology_mapping_spark.functions.strings import (
    shared_token_stats,
    token_jaccard_col,
)
from ontology_mapping_spark.functions.vectors import cosine_pairs_udf
from ontology_mapping_spark.schemas import FEATURE_COLS


def ancestor_pair_stats(pairs: DataFrame, closure: DataFrame) -> DataFrame:
    """Per-pair ancestor-set overlap from the materialized closure:
    (src, tgt, shared_anc, n_anc_src, n_anc_tgt).

    shared = closure(src) ⋈ closure(tgt) on equal ancestor -> count per pair
    (the engine-side form of ``set(nx.ancestors(G,c1)) & set(...)``,
    thesis/process_data_features.py:152-154); union size derives from
    per-node ancestor counts: |A∪B| = |A|+|B|−|A∩B|.

    The stat computation dedups the pair KEYS first (a duplicated input
    row would otherwise count each shared ancestor once per duplicate —
    inflated shared_anc — and the join-back would multiply rows
    quadratically); duplicate input rows still each get their one stats
    row back from the final left join.
    """
    per_node = closure.groupBy("node").agg(F.count("*").alias("n_anc"))
    a1 = closure.select(F.col("node").alias("src"), F.col("ancestor"))
    a2 = closure.select(F.col("node").alias("tgt"), F.col("ancestor"))
    shared = (
        pairs.select("src", "tgt")
        .distinct()
        .join(a1, "src")
        .join(a2, ["tgt", "ancestor"])
        .groupBy("src", "tgt")
        .agg(F.count("*").alias("shared_anc"))
    )
    return (
        pairs.select("src", "tgt")
        .join(shared, ["src", "tgt"], "left")
        .join(
            per_node.select(F.col("node").alias("src"), F.col("n_anc").alias("n_anc_src")),
            "src",
            "left",
        )
        .join(
            per_node.select(F.col("node").alias("tgt"), F.col("n_anc").alias("n_anc_tgt")),
            "tgt",
            "left",
        )
        .fillna(0, ["shared_anc", "n_anc_src", "n_anc_tgt"])
    )


def side_max_depths(label_text_df: DataFrame, depths: DataFrame) -> DataFrame:
    """(side, max_depth) — per-ontology-side max depth, the normalizer of
    norm_depth (thesis/process_data_features.py:121-124). Missing nodes
    count as depth 0 (``concept_depths.get(c, 0)``)."""
    return (
        label_text_df.select("uri", "side")
        .join(depths.withColumnRenamed("node", "uri"), "uri", "left")
        .fillna(0, ["depth"])
        .groupBy("side")
        .agg(F.max("depth").alias("max_depth"))
    )


def compute_features(
    labeled_pairs: DataFrame,
    label_text_df: DataFrame,   # (uri, side, text)
    embeddings: DataFrame,      # (uri, vec)
    depths: DataFrame,          # (node, depth)
    closure: DataFrame,         # (node, ancestor, dist)
    cfg: PipelineConfig | None = None,
    ablation: bool = False,
) -> DataFrame:
    cfg = cfg or PipelineConfig()

    smax = side_max_depths(label_text_df, depths)
    anc_stats = ancestor_pair_stats(labeled_pairs, closure)

    df = (
        labeled_pairs.join(
            F.broadcast(
                label_text_df.select(
                    F.col("uri").alias("src"), F.col("text").alias("l1"),
                    F.col("side").alias("src_side"),
                )
            ),
            "src",
            "left",
        )
        .join(
            F.broadcast(
                label_text_df.select(
                    F.col("uri").alias("tgt"), F.col("text").alias("l2"),
                    F.col("side").alias("tgt_side"),
                )
            ),
            "tgt",
            "left",
        )
        .join(
            F.broadcast(embeddings.select(F.col("uri").alias("src"), F.col("vec").alias("e1"))),
            "src",
            "left",
        )
        .join(
            F.broadcast(embeddings.select(F.col("uri").alias("tgt"), F.col("vec").alias("e2"))),
            "tgt",
            "left",
        )
        .join(
            F.broadcast(depths.select(F.col("node").alias("src"), F.col("depth").alias("d1"))),
            "src",
            "left",
        )
        .join(
            F.broadcast(depths.select(F.col("node").alias("tgt"), F.col("depth").alias("d2"))),
            "tgt",
            "left",
        )
        .join(anc_stats, ["src", "tgt"], "left")
        .join(
            F.broadcast(smax.select(F.col("side").alias("src_side"), F.col("max_depth").alias("maxd1"))),
            "src_side",
            "left",
        )
        .join(
            F.broadcast(smax.select(F.col("side").alias("tgt_side"), F.col("max_depth").alias("maxd2"))),
            "tgt_side",
            "left",
        )
    )

    # NaN/missing embedding guard (:150-151)
    df = df.filter(
        F.col("e1").isNotNull()
        & F.col("e2").isNotNull()
        & ~F.exists(F.col("e1"), lambda x: F.isnan(x))
        & ~F.exists(F.col("e2"), lambda x: F.isnan(x))
    )

    l1 = F.coalesce(F.col("l1"), F.lit(""))
    l2 = F.coalesce(F.col("l2"), F.lit(""))
    d1 = F.coalesce(F.col("d1"), F.lit(0))
    d2 = F.coalesce(F.col("d2"), F.lit(0))
    nd1 = F.when(F.col("maxd1") > 0, d1.cast("double") / F.col("maxd1")).otherwise(F.lit(0.0))
    nd2 = F.when(F.col("maxd2") > 0, d2.cast("double") / F.col("maxd2")).otherwise(F.lit(0.0))
    anc_union = F.col("n_anc_src") + F.col("n_anc_tgt") - F.col("shared_anc")

    cols = {
        "exact_string_match": (l1 == l2).cast("double"),
        "partial_string_match": partial_ratio_udf(l1, l2),
        "weighted_jaccard": token_jaccard_col(l1, l2),
        "cosine_similarity": cosine_pairs_udf(F.col("e1"), F.col("e2")),
        "levenshtein_distance": F.levenshtein(l1, l2).cast("double"),
        "depth_difference": F.abs(d1 - d2).cast("double"),
        "norm_depth_difference": F.abs(nd1 - nd2),
        "ancestor_jaccard": F.when(
            anc_union > 0, F.col("shared_anc").cast("double") / anc_union
        ).otherwise(F.lit(0.0)),
    }
    if not ablation:
        cols = {**shared_token_stats(l1, l2), **cols}

    out_cols = [c for c in FEATURE_COLS if c in cols]
    return df.select(
        "src", "tgt", *[cols[c].alias(c) for c in out_cols], F.col("label")
    )
