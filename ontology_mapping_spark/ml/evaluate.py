"""Evaluation aggregations: classification report as a DataFrame.

Re-expresses sklearn ``classification_report`` (thesis/main.py:124) as
groupBy aggregations over (label, prediction) pairs — per-class precision /
recall / F1 / support plus accuracy and macro/weighted averages, one row per
(class|aggregate, metric). Multi-seed averaging (thesis/main.py:135-145) is
then a plain groupBy(avg) over the union of per-seed reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_counts(preds: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    return preds.groupBy(
        F.col(label_col).alias("label"), F.col(pred_col).alias("prediction")
    ).agg(F.count("*").alias("n"))


def classification_report(
    preds: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> DataFrame:
    """-> (class: string, precision, recall, f1, support) + rows
    'accuracy', 'macro avg', 'weighted avg' (sklearn layout)."""
    cm = confusion_counts(preds, label_col, pred_col).cache()
    tp = cm.filter(F.col("label") == F.col("prediction")).select(
        F.col("label").alias("cls"), F.col("n").alias("tp")
    )
    support = cm.groupBy("label").agg(F.sum("n").alias("support")).withColumnRenamed(
        "label", "cls"
    )
    predicted = cm.groupBy("prediction").agg(F.sum("n").alias("n_pred")).withColumnRenamed(
        "prediction", "cls"
    )
    classes = support.select("cls").unionByName(predicted.select("cls")).distinct()
    per_class = (
        classes.join(tp, "cls", "left")
        .join(support, "cls", "left")
        .join(predicted, "cls", "left")
        .fillna(0, ["tp", "support", "n_pred"])
        .select(
            F.col("cls").cast("string").alias("class"),
            F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
            .otherwise(F.lit(0.0))
            .alias("precision"),
            F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
            .otherwise(F.lit(0.0))
            .alias("recall"),
            F.col("support").cast("long").alias("support"),
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
        .select("class", "precision", "recall", "f1", "support")
    )
    totals = cm.agg(
        F.sum("n").alias("total"),
        F.sum(F.when(F.col("label") == F.col("prediction"), F.col("n")).otherwise(0)).alias("correct"),
    ).select(
        F.lit("accuracy").alias("class"),
        (F.col("correct") / F.col("total")).alias("precision"),
        (F.col("correct") / F.col("total")).alias("recall"),
        (F.col("correct") / F.col("total")).alias("f1"),
        F.col("total").cast("long").alias("support"),
    )
    macro = per_class.agg(
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"),
        F.sum("support").alias("support"),
    ).select(F.lit("macro avg").alias("class"), "precision", "recall", "f1", "support")
    weighted = per_class.agg(
        (F.sum(F.col("precision") * F.col("support")) / F.sum("support")).alias("precision"),
        (F.sum(F.col("recall") * F.col("support")) / F.sum("support")).alias("recall"),
        (F.sum(F.col("f1") * F.col("support")) / F.sum("support")).alias("f1"),
        F.sum("support").alias("support"),
    ).select(F.lit("weighted avg").alias("class"), "precision", "recall", "f1", "support")
    return per_class.unionByName(totals).unionByName(macro).unionByName(weighted)


def average_reports(reports: DataFrame) -> DataFrame:
    """Mean metrics across seeds (thesis/main.py:135-145); input = union of
    classification_report outputs with an extra ``seed`` column."""
    return reports.groupBy("class").agg(
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"),
        F.avg("support").alias("support"),
    )


def triple_pr(got: DataFrame, want: DataFrame) -> dict[str, float]:
    """Precision/recall of emitted (subject, predicate, object) triples vs
    an expected set (the BASELINE.json P/R >= 0.95 gate)."""
    cols = ["subject", "predicate", "object"]
    g = got.select(*cols).distinct().cache()
    w = want.select(*cols).distinct().cache()
    n_got = g.count()
    n_want = w.count()
    inter = g.join(w, cols, "inner").count()
    return {
        "precision": inter / n_got if n_got else 0.0,
        "recall": inter / n_want if n_want else 0.0,
        "n_got": float(n_got),
        "n_want": float(n_want),
    }
