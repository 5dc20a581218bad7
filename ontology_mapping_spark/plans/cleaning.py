"""End-to-end training-corpus cleaning: the round-4 dedup/quality family
composed into one resumable pass (the shape a 100 TB pretraining-data
pipeline actually runs, in dependency order — cheapest filter first so
each stage sees fewer rows):

1. URL-keyed dedup (``url_dedup`` — one shuffle on the canonical key);
2. quality/language verdicts (``corpus_filter`` — within-row, zero
   shuffle) and the keep filter;
3. optional C4-style corpus-wide line dedup (``line_dedup`` — strips
   boilerplate lines BEFORE content dedup, so pages that differ only in
   chrome unify into exact duplicates downstream);
4. exact content dedup (``exact_dedup`` — one shuffle on the text md5);
5. MinHash-LSH near-dup removal (``near_dup_pairs_minhash`` — banded
   bucket join; the HIGHER id of each verified pair drops, so one
   canonical survivor per near-dup cluster chain);
6. per-stage row metrics as a DataFrame (the lineage/metrics story the
   north rule asks of every stage).

No reference analog (the reference has no corpus cleaning); this is the
"beyond the reference" training-data surface composed end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from ontology_mapping_spark.operators.dedup import (
    exact_dedup,
    near_dup_pairs_minhash,
    url_dedup,
)
from ontology_mapping_spark.operators.textstats import corpus_filter


@dataclass
class CleaningConfig:
    lang: str = "en"
    min_tokens: int = 10
    max_tokens: int = 100_000
    min_distinct_frac: float = 0.3
    max_top_bigram_frac: float = 0.2
    min_stopword_ratio: float = 0.01
    min_alpha_ratio: float = 0.5
    near_dup_threshold: float = 0.7
    minhash_num_hashes: int = 16
    minhash_bands: int = 8
    # C4-style corpus-wide duplicate-line removal between the quality and
    # exact-dedup stages (off by default: it rewrites text, so downstream
    # byte-identity contracts must opt in knowingly)
    line_dedup: bool = False
    line_dedup_min_chars: int = 10


def clean_corpus(
    docs: DataFrame,
    cfg: CleaningConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (clean_docs, metrics). ``metrics`` has one (stage, rows) row per
    stage boundary (input, url_dedup, quality_keep, [line_dedup,]
    exact_dedup, near_dup) — counted with ONE action per stage on the already-needed
    intermediate, not extra passes over the corpus.

    Near-dup removal keeps the MIN id of each verified pair and drops the
    rest: with chains (a~b, b~c) both b and c drop — the conservative
    (over-removing, never under-removing) policy standard for training
    data; full transitive clustering is ``graph.connected_components``
    over the pair list when cluster-accurate survivors matter."""
    from ontology_mapping_spark.session import materialize

    cfg = cfg or CleaningConfig()
    metrics: list[tuple[str, int]] = []
    cur = docs
    metrics.append(("input", cur.count()))

    if url_col is not None:
        cur = url_dedup(cur, url_col=url_col, id_col=id_col).drop("url_canon")
        cur = materialize(cur)
        metrics.append(("url_dedup", cur.count()))

    verdicts = corpus_filter(
        cur,
        text_col=text_col,
        id_col=id_col,
        lang=cfg.lang,
        min_tokens=cfg.min_tokens,
        max_tokens=cfg.max_tokens,
        min_distinct_frac=cfg.min_distinct_frac,
        max_top_bigram_frac=cfg.max_top_bigram_frac,
        min_stopword_ratio=cfg.min_stopword_ratio,
        min_alpha_ratio=cfg.min_alpha_ratio,
    )
    cur = cur.join(
        verdicts.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )
    cur = materialize(cur)
    metrics.append(("quality_keep", cur.count()))

    if cfg.line_dedup:
        from ontology_mapping_spark.operators.dedup import line_dedup

        cur = line_dedup(
            cur,
            text_col=text_col,
            id_col=id_col,
            min_chars=cfg.line_dedup_min_chars,
        ).drop("n_lines_kept", "n_lines_total")
        cur = materialize(cur)
        metrics.append(("line_dedup", cur.count()))

    cur = exact_dedup(cur, text_col=text_col, id_col=id_col)
    cur = materialize(cur)
    metrics.append(("exact_dedup", cur.count()))

    pairs = near_dup_pairs_minhash(
        cur,
        text_col=text_col,
        id_col=id_col,
        threshold=cfg.near_dup_threshold,
        num_hashes=cfg.minhash_num_hashes,
        bands=cfg.minhash_bands,
    )
    drop = pairs.select(F.col("b").alias(id_col)).distinct()
    cur = cur.join(drop, id_col, "left_anti")
    cur = materialize(cur)
    metrics.append(("near_dup", cur.count()))

    spark = docs.sparkSession
    mdf = spark.createDataFrame(
        [Row(stage=s, rows=int(n)) for s, n in metrics]
    )
    return cur, mdf
