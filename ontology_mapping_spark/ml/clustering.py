"""Concept clustering: TF-IDF + KMeans (thesis/clustering.py:12-46).

TfidfVectorizer(stop_words="english") + KMeans(k=6, seed=42) + silhouette
-> Tokenizer + StopWordsRemover + CountVectorizer + IDF + pyspark.ml KMeans
+ ClusteringEvaluator. Top terms per cluster come from the (small) centroid
vectors on the driver (thesis/clustering.py:40-46).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import ClusteringEvaluator
from pyspark.ml.feature import IDF, CountVectorizer, StopWordsRemover, Tokenizer
from pyspark.sql import DataFrame


def cluster_labels(
    df: DataFrame,
    text_col: str = "text",
    k: int = 6,
    seed: int = 42,
    vocab_size: int = 1 << 16,
):
    """-> (clustered DataFrame with ``cluster`` column, fitted model,
    silhouette, top terms per cluster)."""
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="_toks"),
            StopWordsRemover(inputCol="_toks", outputCol="_words"),
            CountVectorizer(inputCol="_words", outputCol="_tf", vocabSize=vocab_size),
            IDF(inputCol="_tf", outputCol="_tfidf"),
            KMeans(k=k, seed=seed, featuresCol="_tfidf", predictionCol="cluster"),
        ]
    )
    model = pipe.fit(df)
    out = model.transform(df)
    silhouette = ClusteringEvaluator(
        featuresCol="_tfidf", predictionCol="cluster", metricName="silhouette"
    ).evaluate(out)
    vocab = model.stages[2].vocabulary
    centers = model.stages[4].clusterCenters()
    top_terms = [
        [vocab[i] for i in c.argsort()[::-1][:10] if i < len(vocab)]
        for c in centers
    ]
    return out.drop("_toks", "_words", "_tf"), model, silhouette, top_terms
