"""Entity-linking model: soft-voting ensemble LR + GBT + RF.

Re-expresses thesis/main.py:97-109 with Spark ML estimators:
  LogisticRegression(max_iter=1000, class_weight="balanced") -> LogisticRegression(maxIter, weightCol)
  GradientBoostingClassifier(n_estimators=100)               -> GBTClassifier(maxIter)
  RandomForestClassifier(n_estimators=100, balanced)         -> RandomForestClassifier(numTrees, weightCol)
  VotingClassifier(voting="soft", weights=param1)            -> weighted average of the three probability
                                                                columns, threshold 0.5

"balanced" class weights follow sklearn's rule
w_c = n_samples / (n_classes * n_c), computed from the training frame and
attached as a weightCol (GBTClassifier also accepts weightCol in Spark >=3.0).
Feature id/ground-truth columns are dropped before fit (thesis/main.py:90-93).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    RandomForestClassifier,
)
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig
from ontology_mapping_spark.schemas import FEATURE_COLS


def add_balanced_weights(train: DataFrame, label_col: str = "label") -> DataFrame:
    counts = {r[label_col]: r["n"] for r in train.groupBy(label_col).agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    k = len(counts)
    mapping = F.create_map(
        *[x for c, n in counts.items() for x in (F.lit(c), F.lit(total / (k * n)))]
    )
    return train.withColumn("weight", mapping[F.col(label_col)])


@dataclass
class VotingLinkerModel:
    assembler: VectorAssembler
    models: list
    weights: tuple[float, float, float]
    threshold: float

    def transform(self, df: DataFrame) -> DataFrame:
        out = self.assembler.transform(df)
        probs = []
        for i, m in enumerate(self.models):
            pred = m.transform(out)
            out = pred.withColumn(f"p{i}", vector_to_array("probability")[1]).drop(
                "rawPrediction", "probability", "prediction"
            )
            probs.append(f"p{i}")
        wsum = sum(self.weights)
        vote = sum(
            F.col(p) * (w / wsum) for p, w in zip(probs, self.weights)
        )
        return (
            out.withColumn("p_match", vote)
            .withColumn(
                "prediction", (F.col("p_match") >= self.threshold).cast("int")
            )
            .drop("features", *probs)
        )


def train_voting_linker(
    train_features: DataFrame,
    cfg: PipelineConfig | None = None,
    n_estimators: int | None = None,
    feature_cols: list[str] | None = None,
) -> VotingLinkerModel:
    cfg = cfg or PipelineConfig()
    if n_estimators is None:
        n_estimators = cfg.n_estimators
    if feature_cols is None:
        feature_cols = [c for c in FEATURE_COLS if c in train_features.columns]
        if not feature_cols:  # fall back to every numeric non-id column
            numeric = {"int", "bigint", "float", "double", "smallint"}
            feature_cols = [
                c
                for c, t in train_features.dtypes
                if t in numeric and c not in ("label", "weight")
            ]
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    train = add_balanced_weights(train_features)
    assembled = assembler.transform(train).cache()

    lr = LogisticRegression(
        maxIter=1000,
        featuresCol="features",
        labelCol="label",
        weightCol="weight",
        standardization=True,
    )
    gbt = GBTClassifier(
        maxIter=n_estimators,
        featuresCol="features",
        labelCol="label",
        seed=cfg.seed,
    )
    rf = RandomForestClassifier(
        numTrees=n_estimators,
        featuresCol="features",
        labelCol="label",
        weightCol="weight",
        seed=cfg.seed,
    )
    models = [est.fit(assembled) for est in (lr, gbt, rf)]
    assembled.unpersist()
    return VotingLinkerModel(
        assembler=assembler,
        models=models,
        weights=cfg.voting_weights,
        threshold=cfg.decision_threshold,
    )


def feature_importances(model: VotingLinkerModel, feature_cols: list[str]) -> list[tuple[str, float]]:
    """RF/GBT featureImportances as (name, importance) (reference:
    clf.feature_importances_, thesis/render_output.py:3-17)."""
    out = {}
    for m in model.models:
        if hasattr(m, "featureImportances"):
            arr = m.featureImportances.toArray()
            for name, v in zip(feature_cols, arr):
                out[name] = out.get(name, 0.0) + float(v)
    n = sum(1 for m in model.models if hasattr(m, "featureImportances"))
    return sorted(
        ((k, v / max(n, 1)) for k, v in out.items()), key=lambda kv: -kv[1]
    )
