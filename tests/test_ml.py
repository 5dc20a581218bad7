"""ML layer: classification report vs sklearn-style oracle, experiment
sweep, TF-IDF + KMeans clustering."""

import math

import pytest
from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig
from ontology_mapping_spark.ml.clustering import cluster_labels
from ontology_mapping_spark.ml.evaluate import classification_report, triple_pr
from ontology_mapping_spark.ml.experiments import run_experiment
from ontology_mapping_spark.ml.linker import feature_importances, train_voting_linker


def py_report(pairs):
    """Pure-Python per-class P/R/F1 (sklearn classification_report logic)."""
    classes = sorted({l for l, _ in pairs} | {p for _, p in pairs})
    out = {}
    for c in classes:
        tp = sum(1 for l, p in pairs if l == c and p == c)
        n_pred = sum(1 for _, p in pairs if p == c)
        sup = sum(1 for l, _ in pairs if l == c)
        prec = tp / n_pred if n_pred else 0.0
        rec = tp / sup if sup else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[str(c)] = (prec, rec, f1, sup)
    acc = sum(1 for l, p in pairs if l == p) / len(pairs)
    out["accuracy"] = (acc, acc, acc, len(pairs))
    return out


def test_classification_report_matches_oracle(spark):
    pairs = [(1, 1)] * 8 + [(1, 0)] * 2 + [(0, 0)] * 15 + [(0, 1)] * 3
    df = spark.createDataFrame(pairs, "label int, prediction int")
    got = {r["class"]: r for r in classification_report(df).collect()}
    want = py_report(pairs)
    for cls in ("0", "1", "accuracy"):
        for i, m in enumerate(("precision", "recall", "f1")):
            assert math.isclose(got[cls][m], want[cls][i], abs_tol=1e-12), (cls, m)
        assert got[cls]["support"] == want[cls][3]
    assert "macro avg" in got and "weighted avg" in got


def _toy_features(spark, n=120, seed=3):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        label = i % 3 == 0
        x1 = (0.8 if label else 0.2) + rng.uniform(-0.15, 0.15)
        x2 = (0.7 if label else 0.3) + rng.uniform(-0.2, 0.2)
        rows.append((f"s{i}", f"t{i}", x1, x2, int(label)))
    return spark.createDataFrame(
        rows, "src string, tgt string, f1 double, f2 double, label int"
    )


def test_voting_linker_and_importances(spark):
    train = _toy_features(spark, 120, seed=3)
    test = _toy_features(spark, 60, seed=4)
    cfg = PipelineConfig(voting_weights=(1.0, 1.0, 2.0))
    model = train_voting_linker(train, cfg, n_estimators=10, feature_cols=["f1", "f2"])
    preds = model.transform(test)
    assert set(["p_match", "prediction"]).issubset(set(preds.columns))
    rep = {r["class"]: r for r in classification_report(preds).collect()}
    assert rep["1"]["f1"] > 0.9
    imp = feature_importances(model, ["f1", "f2"])
    assert len(imp) == 2 and all(v >= 0 for _, v in imp)


def test_experiment_sweep_averages_seeds(spark):
    train = _toy_features(spark, 90, seed=5)
    test = _toy_features(spark, 45, seed=6)
    out = run_experiment(
        train,
        test,
        weights_list=[(1, 1, 1), (1, 1, 2)],
        seeds=[42, 7],
        n_estimators=5,
    )
    rows = out.collect()
    weights = {r["weights"] for r in rows}
    assert weights == {"1/1/1", "1/1/2"}
    classes = {r["class"] for r in rows if r["weights"] == "1/1/1"}
    assert {"0", "1", "accuracy", "macro avg", "weighted avg"} <= classes


def test_tfidf_kmeans_clustering(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    clustered, model, silhouette, top_terms = cluster_labels(
        docs, text_col="text", k=4, seed=42
    )
    assert clustered.select("cluster").distinct().count() <= 4
    assert -1.0 <= silhouette <= 1.0
    assert len(top_terms) == 4 and all(len(t) > 0 for t in top_terms)
    # determinism: same seed -> same assignment
    c2, _, _, _ = cluster_labels(docs, text_col="text", k=4, seed=42)
    a = {r["doc_id"]: r["cluster"] for r in clustered.select("doc_id", "cluster").collect()}
    b = {r["doc_id"]: r["cluster"] for r in c2.select("doc_id", "cluster").collect()}
    assert a == b


def test_triple_pr_math(spark):
    got = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y"), ("c", "p", "z")],
        "subject string, predicate string, object string",
    )
    want = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y"), ("d", "p", "w"), ("e", "p", "v")],
        "subject string, predicate string, object string",
    )
    pr = triple_pr(got, want)
    assert math.isclose(pr["precision"], 2 / 3)
    assert math.isclose(pr["recall"], 0.5)
