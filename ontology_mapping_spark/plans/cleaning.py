"""End-to-end training-corpus cleaning: the round-4 dedup/quality family
composed into one plan (the shape a 100 TB pretraining-data pipeline
actually runs, in dependency order — cheapest filter first so each stage
sees fewer rows). Two forms: :func:`clean_corpus` (in-memory, one counted
action per stage) and :func:`clean_corpus_staged` (every stage boundary
checkpointed through ``StageRunner`` — resumable, metrics from manifests):

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
6. optional benchmark decontamination (``decontaminate`` — drop docs
   sharing any 13-gram with a held-out eval set; last, so the earlier
   stages stay reusable across eval-set revisions);
7. per-stage row metrics as a DataFrame (the lineage/metrics story the
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
    eval_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (clean_docs, metrics). ``metrics`` has one (stage, rows) row per
    stage boundary (input, url_dedup, quality_keep, [line_dedup,]
    exact_dedup, near_dup, [decontaminate]) — counted with ONE action per
    stage on the already-needed intermediate, not extra passes over the
    corpus. Passing ``eval_df`` appends benchmark decontamination
    (:func:`~ontology_mapping_spark.operators.dedup.decontaminate`) as the
    final stage — last because it is the only stage whose victims depend
    on an external table, so everything before it stays reusable across
    eval-set revisions.

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

    if eval_df is not None:
        from ontology_mapping_spark.operators.dedup import decontaminate

        cur = decontaminate(cur, eval_df, text_col=text_col, id_col=id_col)
        cur = materialize(cur)
        metrics.append(("decontaminate", cur.count()))

    spark = docs.sparkSession
    mdf = spark.createDataFrame(
        [Row(stage=s, rows=int(n)) for s, n in metrics]
    )
    return cur, mdf


def clean_corpus_staged(
    spark,
    workdir: str,
    docs: DataFrame,
    cfg: CleaningConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: str | None = None,
    eval_df: DataFrame | None = None,
    catalog: str | None = None,
    table_format: str = "iceberg",
):
    """Checkpointed :func:`clean_corpus`: every stage lands through
    ``StageRunner.materialize`` (parquet locally; Iceberg tables when
    ``catalog`` is set), so a killed run resumes at the last completed
    stage boundary and a re-run skips every stage — the north rule's
    resumability contract applied to the cleaning plan. The runner is
    keyed on the ``CleaningConfig`` hash: any knob change invalidates the
    whole chain (and only downstream stages rebuild if you re-point an
    upstream). Per-stage row metrics come from the stage manifests — no
    extra count actions over the corpus at all in this form.

    -> (clean_docs, metrics_df, runner) — ``runner.events`` records
    built/skipped per stage for resume assertions.
    """
    from ontology_mapping_spark.operators.dedup import (
        exact_dedup,
        line_dedup,
        near_dup_pairs_minhash,
        url_dedup,
    )
    from ontology_mapping_spark.plans.stages import StageRunner

    cfg = cfg or CleaningConfig()
    runner = StageRunner(
        spark, workdir, cfg, catalog=catalog, table_format=table_format
    )
    stages: list[str] = []
    cur, prev = docs, "corpus_input"

    if url_col is not None:
        cur = runner.materialize(
            "clean_url_dedup",
            lambda d=cur: url_dedup(d, url_col=url_col, id_col=id_col).drop(
                "url_canon"
            ),
            inputs=[prev],
        )
        prev = "clean_url_dedup"
        stages.append(prev)

    def _quality(d=cur):
        verdicts = corpus_filter(
            d,
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
        return d.join(
            verdicts.filter(F.col("keep")).select(id_col), id_col, "left_semi"
        )

    cur = runner.materialize("clean_quality", _quality, inputs=[prev])
    prev = "clean_quality"
    stages.append(prev)

    if cfg.line_dedup:
        cur = runner.materialize(
            "clean_line_dedup",
            lambda d=cur: line_dedup(
                d,
                text_col=text_col,
                id_col=id_col,
                min_chars=cfg.line_dedup_min_chars,
            ).drop("n_lines_kept", "n_lines_total"),
            inputs=[prev],
        )
        prev = "clean_line_dedup"
        stages.append(prev)

    cur = runner.materialize(
        "clean_exact_dedup",
        lambda d=cur: exact_dedup(d, text_col=text_col, id_col=id_col),
        inputs=[prev],
    )
    prev = "clean_exact_dedup"
    stages.append(prev)

    def _near_dup(d=cur):
        pairs = near_dup_pairs_minhash(
            d,
            text_col=text_col,
            id_col=id_col,
            threshold=cfg.near_dup_threshold,
            num_hashes=cfg.minhash_num_hashes,
            bands=cfg.minhash_bands,
        )
        drop = pairs.select(F.col("b").alias(id_col)).distinct()
        return d.join(drop, id_col, "left_anti")

    cur = runner.materialize("clean_near_dup", _near_dup, inputs=[prev])
    prev = "clean_near_dup"
    stages.append(prev)

    if eval_df is not None:
        from ontology_mapping_spark.operators.dedup import decontaminate

        # the eval table is an external input: its NAME feeds the build-id
        # chain (a revised eval set needs a fresh workdir, same contract as
        # every external input — see plans/stages.py module docstring)
        cur = runner.materialize(
            "clean_decontaminate",
            lambda d=cur: decontaminate(
                d, eval_df, text_col=text_col, id_col=id_col
            ),
            inputs=[prev, "eval_input"],
        )
        stages.append("clean_decontaminate")

    mdf = spark.createDataFrame(
        [Row(stage=s, rows=int(runner.manifest(s)["rows"])) for s in stages]
    )
    return cur, mdf, runner
