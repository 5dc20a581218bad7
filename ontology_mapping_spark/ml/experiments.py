"""Experiment driver: weight-vector sweep × multi-seed averaging.

Re-expresses the reference's experiment loop (thesis/main.py:115-152):
for each voting-weight vector, train/evaluate once per seed and average
the classification reports. The per-run report is a DataFrame; the sweep
accumulates them with a (weights, seed) tag and averages with a groupBy —
no driver-side metric dicts.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig
from ontology_mapping_spark.ml.evaluate import classification_report
from ontology_mapping_spark.ml.linker import train_voting_linker

DEFAULT_WEIGHTS = [
    (1, 1, 1), (1, 1, 2), (1, 2, 1), (2, 1, 1), (1, 2, 2), (2, 1, 2), (2, 2, 1),
]  # thesis/main.py:116
DEFAULT_SEEDS = [42, 56, 25, 111, 4]  # thesis/main.py:121


def run_experiment(
    feat_train: DataFrame,
    feat_test: DataFrame,
    cfg: PipelineConfig | None = None,
    weights_list: list[tuple[float, float, float]] | None = None,
    seeds: list[int] | None = None,
    n_estimators: int = 100,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """-> (weights: string, class, precision, recall, f1, support) — one row
    per weight vector × report row, metrics averaged over seeds."""
    cfg = cfg or PipelineConfig()
    weights_list = weights_list or DEFAULT_WEIGHTS
    seeds = seeds or DEFAULT_SEEDS

    all_reports: DataFrame | None = None
    # voting weights only mix the already-fitted models' probability
    # columns (linker.VotingLinkerModel) — fit ONCE per seed and re-mix
    # per weight vector instead of retraining the ensemble |weights| times
    for seed in seeds:
        base = train_voting_linker(
            feat_train,
            replace(cfg, seed=seed),
            n_estimators=n_estimators,
            feature_cols=feature_cols,
        )
        for weights in weights_list:
            model = replace(base, weights=tuple(float(w) for w in weights))
            preds = model.transform(feat_test)
            rep = classification_report(preds).withColumns(
                {
                    "weights": F.lit("/".join(str(w) for w in weights)),
                    "seed": F.lit(seed),
                }
            )
            all_reports = rep if all_reports is None else all_reports.unionByName(rep)

    return all_reports.groupBy("weights", "class").agg(
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"),
        F.avg("support").alias("support"),
    )
