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
    'accuracy', 'macro avg', 'weighted avg' (sklearn layout).

    The confusion matrix is <= |classes|^2 rows, so it is collected once
    and the report derived driver-side: ONE Spark job per report (the
    former all-DataFrame form ran a cached multi-join DAG per report and
    leaked the cache for the session lifetime — 35 of them per experiment
    sweep)."""
    cm = {
        (r["label"], r["prediction"]): r["n"]
        for r in confusion_counts(preds, label_col, pred_col).collect()
    }
    classes = sorted({c for pair in cm for c in pair})
    total = sum(cm.values())
    correct = sum(n for (lbl, prd), n in cm.items() if lbl == prd)

    rows = []
    for c in classes:
        tp = cm.get((c, c), 0)
        support = sum(n for (lbl, _), n in cm.items() if lbl == c)
        n_pred = sum(n for (_, prd), n in cm.items() if prd == c)
        precision = tp / n_pred if n_pred > 0 else 0.0
        recall = tp / support if support > 0 else 0.0
        f1 = (
            2 * precision * recall / (precision + recall)
            if (precision + recall) > 0
            else 0.0
        )
        rows.append((str(c), precision, recall, f1, support))

    acc = correct / total if total else 0.0
    n_cls = max(len(rows), 1)
    tot_sup = sum(r[4] for r in rows)
    macro = (
        "macro avg",
        sum(r[1] for r in rows) / n_cls,
        sum(r[2] for r in rows) / n_cls,
        sum(r[3] for r in rows) / n_cls,
        tot_sup,
    )
    weighted = (
        "weighted avg",
        sum(r[1] * r[4] for r in rows) / tot_sup if tot_sup else 0.0,
        sum(r[2] * r[4] for r in rows) / tot_sup if tot_sup else 0.0,
        sum(r[3] * r[4] for r in rows) / tot_sup if tot_sup else 0.0,
        tot_sup,
    )
    rows += [("accuracy", acc, acc, acc, total), macro, weighted]
    return preds.sparkSession.createDataFrame(
        rows,
        "class string, precision double, recall double, f1 double, support long",
    )


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
    g = got.select(*cols).distinct().withColumn("__g", F.lit(1))
    w = want.select(*cols).distinct().withColumn("__w", F.lit(1))
    # single full-outer join + one aggregate: no caches to leak, one job
    stats = (
        g.join(w, cols, "full")
        .agg(
            F.count("__g").alias("n_got"),
            F.count("__w").alias("n_want"),
            F.count(F.when(F.col("__g").isNotNull() & F.col("__w").isNotNull(), 1)).alias("inter"),
        )
        .first()
    )
    n_got, n_want, inter = stats["n_got"], stats["n_want"], stats["inter"]
    return {
        "precision": inter / n_got if n_got else 0.0,
        "recall": inter / n_want if n_want else 0.0,
        "n_got": float(n_got),
        "n_want": float(n_want),
    }
