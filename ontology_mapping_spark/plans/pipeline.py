"""End-to-end KG-construction pipeline (SURVEY.md §7 stage order).

S1 ingest/extract -> S2 graph precompute -> S3 mentions + candidates ->
S4 features -> S5 linking model -> S6 canonicalization -> S7 triple emission.
Every stage is materialized through :class:`StageRunner` (checkpoint/resume +
manifests). Mirrors the reference driver thesis/main.py:32-111 end-to-end,
with the web-pages mention stages the north star adds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig
from ontology_mapping_spark.functions.vectors import make_embed_udf
from ontology_mapping_spark.ml.evaluate import classification_report
from ontology_mapping_spark.ml.linker import VotingLinkerModel, train_voting_linker
from ontology_mapping_spark.operators import graph as G
from ontology_mapping_spark.operators.blocking import (
    generate_candidates_with_negatives,
)
from ontology_mapping_spark.operators.features import compute_features
from ontology_mapping_spark.operators.labels import (
    extract_hierarchy,
    extract_labels,
    label_text,
)
from ontology_mapping_spark.operators.mentions import (
    label_phrases,
    mention_triples,
    detect_mentions,
)
from ontology_mapping_spark.plans.stages import StageRunner
from ontology_mapping_spark.sources.pages import extracted_pages


@dataclass
class PipelineResult:
    triples: DataFrame
    mention_triples: DataFrame
    link_triples: DataFrame
    report: DataFrame
    model: VotingLinkerModel
    runner: StageRunner
    extras: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    triples: DataFrame,
    align_train: DataFrame,
    align_test: DataFrame,
    pages: DataFrame,
    workdir: str,
    cfg: PipelineConfig | None = None,
    n_estimators: int | None = None,
) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    if n_estimators is not None:
        # fold into cfg so the stage config-hash covers it — otherwise a
        # re-run with different n_estimators would reuse stale predictions
        from dataclasses import replace

        cfg = replace(cfg, n_estimators=n_estimators)
    run = StageRunner(spark, workdir, cfg)

    # --- S1: ingest & extract (thesis/main.py:37-58) -----------------------
    labels = run.materialize("labels", lambda: extract_labels(triples, cfg), ["triples"])
    edges = run.materialize("edges", lambda: extract_hierarchy(triples, cfg), ["triples"])
    ltext = run.materialize("label_text", lambda: label_text(labels), ["labels"])
    emb = run.materialize(
        "embeddings",
        lambda: ltext.select(
            "uri", make_embed_udf(cfg.embedding_dim)(F.col("text")).alias("vec")
        ),
        ["label_text"],
    )
    pages_text = run.materialize(
        "pages_text", lambda: extracted_pages(pages), ["web_pages"]
    )

    # --- S2: graph precompute (closure + depths, materialized once) --------
    closure = run.materialize(
        "closure",
        lambda: G.transitive_closure(edges, cfg.closure_max_iters),
        ["edges"],
    )
    depths = run.materialize("depths", lambda: G.depths(edges, closure), ["closure"])

    # --- S3: mentions + candidates ------------------------------------------
    phrases = run.materialize("phrases", lambda: label_phrases(labels), ["labels"])
    # vocabulary-size crossover (mentions.detect_mentions): the broadcast
    # C kernel for ontology-sized vocabularies, the blocking join past the
    # per-worker automaton budget — the flagship degrades instead of OOMing.
    # label_phrases output is distinct by construction and just hit parquet,
    # so a plain footer-metadata count picks the kernel without the
    # distinct+shuffle job detect_mentions would otherwise run
    mentions = run.materialize(
        "mentions",
        lambda: detect_mentions(pages_text, phrases, n_phrases=phrases.count()),
        ["pages_text", "phrases"],
    )
    # the default side inference splits the URI curie prefix; real ontology
    # URIs (http://...) would silently collapse both sides into one and
    # yield zero candidates — fail loud instead (pass side= explicitly to
    # extract_labels, or re-tag the label table, when using real URIs)
    sides = {r["side"] for r in ltext.select("side").distinct().collect()}
    if not sides <= {"src", "tgt"}:
        raise ValueError(
            f"label side tags must be exactly 'src'/'tgt', got {sorted(sides)!r}; "
            "URI-prefix side inference only fits the 'src:'/'tgt:' curie "
            "scheme — tag sides explicitly for real ontology URIs"
        )
    src_t = ltext.filter(F.col("side") == "src")
    tgt_t = ltext.filter(F.col("side") == "tgt")
    cand_train = run.materialize(
        "cand_train",
        lambda: generate_candidates_with_negatives(
            align_train, src_t, tgt_t, edges, closure, cfg
        ),
        ["align_train", "label_text", "edges", "closure"],
    )
    cand_test = run.materialize(
        "cand_test",
        lambda: generate_candidates_with_negatives(
            align_test, src_t, tgt_t, edges, closure, cfg
        ),
        ["align_test", "label_text", "edges", "closure"],
    )

    # --- S4: features (thesis/main.py:86-87) --------------------------------
    feat_train = run.materialize(
        "features_train",
        lambda: compute_features(cand_train, ltext, emb, depths, closure, cfg),
        ["cand_train"],
    )
    feat_test = run.materialize(
        "features_test",
        lambda: compute_features(cand_test, ltext, emb, depths, closure, cfg),
        ["cand_test"],
    )

    # --- S5: linking model (thesis/main.py:90-110) ---------------------------
    # model fitting is skipped entirely when downstream predictions are
    # already materialized for this config (model itself is not persisted)
    model = None
    if not run.is_current("predictions"):
        model = train_voting_linker(feat_train, cfg)
    preds = run.materialize(
        "predictions",
        lambda: model.transform(feat_test).select("src", "tgt", "label", "p_match", "prediction"),
        ["features_test"],
    )
    report = run.materialize(
        "report", lambda: classification_report(preds), ["predictions"]
    )

    # --- S6: canonicalization (accepted links ∪ exactMatch -> CC) ------------
    accepted = preds.filter(F.col("prediction") == 1).select("src", "tgt")
    exact = triples.filter(
        F.col("predicate") == cfg.predicates["exact_match"]
    ).select(F.col("subject").alias("src"), F.col("object").alias("tgt"))
    link_edges = accepted.unionByName(exact).select(
        F.col("src").alias("u"), F.col("tgt").alias("v")
    )
    components = run.materialize(
        "components",
        lambda: G.connected_components(
            link_edges, vertices=labels.select(F.col("uri").alias("node"))
        ),
        ["predictions", "triples"],
    )

    # --- S7: triple emission --------------------------------------------------
    # typed entity-entity relations from sentence-level patterns (the north
    # rule's "triple extraction" proper, beyond mentionedIn provenance);
    # phrase vocabulary re-folded to the relations matching contract
    # (idempotent for the golden-normalized label phrases)
    def build_relations() -> DataFrame:
        from ontology_mapping_spark.operators.relations import (
            fold_sentence,
            pattern_relations,
            sentence_mentions,
            split_sentences,
        )

        vocab = phrases.select("uri", fold_sentence("phrase").alias("phrase"))
        return pattern_relations(
            sentence_mentions(split_sentences(pages_text), vocab)
        )

    relations = run.materialize(
        "relations", build_relations, ["pages_text", "phrases"]
    )

    def build_out() -> DataFrame:
        m = mention_triples(mentions, cfg.predicates["mentions"])
        canon = components.select(
            F.col("node").alias("subject"), F.col("component")
        )
        m_canon = (
            m.join(canon, "subject", "left")
            .select(
                F.coalesce(F.col("component"), F.col("subject")).alias("subject"),
                "predicate",
                "object",
            )
            .distinct()
        )
        links = accepted.select(
            F.col("src").alias("subject"),
            F.lit(cfg.predicates["same_as"]).alias("predicate"),
            F.col("tgt").alias("object"),
        )
        # relation triples canonicalize BOTH endpoints through components
        rel = (
            relations.select(
                F.col("subj").alias("subject"),
                F.col("pred").alias("predicate"),
                F.col("obj").alias("object"),
            )
            .join(canon, "subject", "left")
            .select(
                F.coalesce(F.col("component"), F.col("subject")).alias("subject"),
                "predicate",
                F.col("object"),
            )
            .join(canon.withColumnRenamed("subject", "object"), "object", "left")
            .select(
                "subject",
                "predicate",
                F.coalesce(F.col("component"), F.col("object")).alias("object"),
            )
            .distinct()
        )
        return m_canon.unionByName(links).unionByName(rel)

    out = run.materialize(
        "kg_triples", build_out, ["mentions", "components", "predictions", "relations"]
    )

    return PipelineResult(
        triples=out,
        mention_triples=mention_triples(mentions, cfg.predicates["mentions"]),
        link_triples=preds.filter(F.col("prediction") == 1),
        report=report,
        model=model,
        runner=run,
        extras={"relation_triples": relations},
    )
