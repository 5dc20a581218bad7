"""Mention disambiguation: ambiguous surface -> one concept, by context.

The mention detectors (operators/mentions.py) correctly emit EVERY
concept whose label matches a surface — two ontology concepts sharing a
label both claim the mention. A KG should store one: this module scores
each candidate by the cosine between the PAGE's embedding (its textual
context) and the CONCEPT's embedding, and keeps the argmax per
(url, surface) — the standard context-similarity disambiguation, using
the engine's existing embedding slot (deterministic hashed BoW by
default, a real model via make_model_embed_udf when one ships).

Scale shape (100 TB): one vectorized pandas-UDF embedding pass over the
distinct pages that carry an ambiguous mention (a semi-join prunes the
corpus FIRST — unambiguous pages never reach Python), concept vectors
are ontology-sized and broadcast, and the winner per (url, surface) is a
partial+final ``max(struct(score, uri))`` aggregate — no window over the
corpus-sized key, the same winner-struct shape as line_dedup. Ties break
lexicographically on uri (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.functions.vectors import cosine_col, make_embed_udf


def ambiguous_keys(mentions: DataFrame) -> DataFrame:
    """(url, surface) keys claimed by >1 uri — the partial+final
    countDistinct over the mention table, defined ONCE and shared by
    every consumer (``ambiguous_mentions``, both sides of
    ``resolve_mentions``). Sharing the definition keeps the semantics in
    one place; Spark may still recompute the subtree per plan branch
    (ReuseExchange is physical-plan luck), which is fine in the pipeline
    because ``mentions`` is a StageRunner-materialized parquet table —
    each branch re-scans files, not a recomputed upstream job. Callers
    composing over a NON-materialized corpus-scale mention frame should
    persist it (or these keys) first."""
    return (
        mentions.groupBy("url", "surface")
        .agg(F.countDistinct("uri").alias("n_uris"))
        .filter(F.col("n_uris") > 1)
        .select("url", "surface")
    )


def ambiguous_mentions(mentions: DataFrame) -> DataFrame:
    """The subset of (url, surface) mention rows claimed by >1 uri.
    Partial+final count on the pair key, then an inner join back —
    unambiguous mentions (the overwhelming majority) bypass
    disambiguation entirely."""
    return mentions.join(ambiguous_keys(mentions), ["url", "surface"])


def disambiguate_mentions(
    mentions: DataFrame,
    pages_text: DataFrame,
    concept_vecs: DataFrame,
    embed_udf=None,
    dim: int = 64,
    amb_keys: DataFrame | None = None,
) -> DataFrame:
    """Resolve ambiguous mentions to ONE uri each.

    mentions:     (url, uri, surface, ...) from any mention detector
    pages_text:   (url, text)
    concept_vecs: (uri, vec array<float/double>) — ontology-sized
    Returns (url, surface, uri, score): one row per formerly-ambiguous
    (url, surface), uri = argmax cosine(page vec, concept vec).

    Unambiguous mentions are NOT returned — callers keep them as-is and
    anti-join the losers; see :func:`resolve_mentions`. An ambiguous key
    whose page is missing from ``pages_text`` or whose candidates have no
    concept vector yields NO row here (nothing to score) —
    ``resolve_mentions`` keeps those via a deterministic fallback.

    ``amb_keys``: precomputed ``ambiguous_keys(mentions)`` so a caller
    that also needs the keys doesn't duplicate the corpus-scale aggregate
    in its plan."""
    embed_udf = make_embed_udf(dim) if embed_udf is None else embed_udf
    keys = ambiguous_keys(mentions) if amb_keys is None else amb_keys
    amb = mentions.join(keys, ["url", "surface"]).select(
        "url", "surface", "uri"
    )
    # embed only pages that actually carry an ambiguous mention
    pages_needed = pages_text.join(
        amb.select("url").distinct(), "url", "left_semi"
    )
    pvec = pages_needed.select(
        "url", embed_udf(F.col("text")).alias("pvec")
    )
    scored = (
        amb.join(pvec, "url")
        .join(F.broadcast(concept_vecs), "uri")
        .select(
            "url",
            "surface",
            "uri",
            cosine_col(F.col("pvec"), F.col("vec")).alias("score"),
        )
    )
    best = (
        scored.groupBy("url", "surface")
        # max over struct(score, uri): deterministic argmax, partial+final
        .agg(F.max(F.struct("score", "uri")).alias("w"))
        .select(
            "url",
            "surface",
            F.col("w.uri").alias("uri"),
            F.col("w.score").alias("score"),
        )
    )
    return best


def resolve_mentions(
    mentions: DataFrame,
    pages_text: DataFrame,
    concept_vecs: DataFrame,
    embed_udf=None,
    dim: int = 64,
) -> DataFrame:
    """The full mention table with ambiguity resolved: unambiguous rows
    pass through untouched; for ambiguous (url, surface) only the
    winning uri's row survives. NO mention key is ever dropped: an
    ambiguous key that context scoring cannot decide (its page is absent
    from ``pages_text``, or none of its candidate uris has a concept
    vector) falls back to the lexicographically LARGEST uri — the same
    tie-break direction the scored path's max(struct(score, uri)) applies
    to equal scores, so which code path ran never flips a tied outcome.
    Both paths keep EVERY mention row of the winning uri (a uri repeated
    with different payload columns keeps all its rows).

    ``keys`` (the corpus-scale ambiguity aggregate, referenced by three
    joins below) and ``best`` (the embed+score path, referenced twice)
    are materialized once — Spark re-executes a plan-level reference per
    consumer otherwise. ``mentions`` itself is referenced five times but
    stays the CALLER's persistence decision: in the pipeline it is a
    stage-boundary parquet (cheap pruned re-scans), and checkpointing a
    10^12-row table inside a library call would be worse than the
    re-reads."""
    from ontology_mapping_spark.session import materialize

    keys = materialize(ambiguous_keys(mentions))
    best = materialize(
        disambiguate_mentions(
            mentions,
            pages_text,
            concept_vecs,
            embed_udf=embed_udf,
            dim=dim,
            amb_keys=keys,
        ).select("url", "surface", "uri")
    )
    unambiguous = mentions.join(keys, ["url", "surface"], "left_anti")
    winners = mentions.join(best, ["url", "surface", "uri"])
    # ambiguous keys with no scored winner: deterministic max-uri fallback
    # so the mention survives resolution instead of silently vanishing;
    # join the CHOICE back to the mention table so every row of the chosen
    # uri survives — identical multiplicity contract to the winners path
    unscored = keys.join(
        best.select("url", "surface"), ["url", "surface"], "left_anti"
    )
    fb_choice = (
        mentions.join(unscored, ["url", "surface"])
        .groupBy("url", "surface")
        .agg(F.max("uri").alias("uri"))
    )
    fallback = mentions.join(fb_choice, ["url", "surface", "uri"])
    return unambiguous.unionByName(winners).unionByName(fallback)
