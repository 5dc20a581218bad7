"""Candidate-pair generation: token blocking, top-k retrieval, negatives.

Re-expresses thesis/generate_candidates.py as DataFrame dataflow:

* inverted token index (:99-103)  -> flat (token, uri) posting DataFrame;
  "lookup" is an equi-join. Hot tokens (stop-word-like) are the skew risk at
  web scale: tokens above a document-frequency cap are dropped (the
  reference only survives without this because ontologies are tiny) and the
  join runs under AQE skew-join; an explicit salting variant is provided.
* generate_candidate_pairs (:57-77)     -> cosine + partial-ratio thresholds
  with per-source top-k (window group-limit).
* generate_candidate_pairs_with_negatives_manual (:79-154) -> positives ∪
  IDF negatives (token-blocking join) ∪ neighbour negatives (2-hop sibling
  self-join), exclusions as anti-joins, deterministic per-SOURCE sampling
  (documented divergence: the reference samples per alignment row, so a
  source with several true targets gets the cap once here, not once per
  positive — the per-src rule is the canonical form the oracle pins).
* label_candidate_pairs (:13-31), generate_all_possible_pairs (:216-220),
  select_training_pairs (:223-232).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig
from ontology_mapping_spark.functions.fuzzy import partial_ratio_udf
from ontology_mapping_spark.functions.vectors import cosine_pairs_udf
from ontology_mapping_spark.operators.sampling import sample_per_group
from ontology_mapping_spark.session import materialize


def posting_lists(
    label_text_df: DataFrame, max_token_df: int | None = None
) -> DataFrame:
    """(uri, text) -> flat (token, uri) posting list.

    Reference builds ``defaultdict(token -> set(uri))``
    (thesis/generate_candidates.py:99-103); the engine keeps it flat — giant
    arrays on hot tokens would skew, flat rows shuffle evenly. Tokens with
    document frequency above ``max_token_df`` are dropped (df-cap, SURVEY §4).
    """
    tok = (
        label_text_df.select(
            "uri", F.explode(F.split(F.col("text"), r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    if max_token_df is not None:
        hot = (
            tok.groupBy("token")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_token_df)
            .select("token")
        )
        tok = tok.join(F.broadcast(hot), "token", "left_anti")
    return tok


def _pin(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition on join keys with a USER-PINNED partition count.

    The inverted-index join's hazard is an OUTPUT explosion from a tiny
    input: AQE's partition coalescing sizes the join stage from the
    pre-join shuffle bytes (two small posting lists), merges it down to
    1-2 tasks, and those tasks then emit the whole hot cross product
    single-threaded — re-creating the very skew the salt removed
    (measured 9x on tools/stress_skew.py). An explicit
    repartition(numPartitions, keys) is marked user-specified, which AQE
    never coalesces, so the reducer count survives to runtime."""
    conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    try:
        n = int(conf)
    except (TypeError, ValueError):  # e.g. "auto" on managed platforms
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in cols])


def blocking_join(
    src_text: DataFrame, tgt_text: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Token-blocking candidate retrieval: distinct (src, tgt) pairs sharing
    >= 1 normalized label token (the union-of-posting-lists probe,
    thesis/generate_candidates.py:119-124)."""
    cfg = cfg or PipelineConfig()
    s = posting_lists(src_text.select("uri", "text"), cfg.max_token_df).withColumnRenamed(
        "uri", "src"
    )
    t = posting_lists(tgt_text.select("uri", "text"), cfg.max_token_df).withColumnRenamed(
        "uri", "tgt"
    )
    return (
        _pin(s, "token").join(_pin(t, "token"), "token")
        .select("src", "tgt")
        .distinct()
    )


def salted_blocking_join(
    src_text: DataFrame, tgt_text: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Skew-hardened blocking join: replicate the (smaller) target postings
    across ``salt_buckets`` and route source probes by hash-salt, so a hot
    token's pairs spread over S reducers instead of one (north rule's
    "skew-key salting on hot entities"). Semantics identical to
    :func:`blocking_join`.

    AQE interaction: partition coalescing would size the join stage from
    the tiny pre-join posting bytes and merge the salted partitions back
    together (the output explosion is invisible to it) — the join inputs
    are therefore pinned via :func:`_pin`, which AQE never coalesces."""
    cfg = cfg or PipelineConfig()
    S = cfg.salt_buckets
    s = (
        posting_lists(src_text.select("uri", "text"), cfg.max_token_df)
        .withColumnRenamed("uri", "src")
        .withColumn("salt", F.pmod(F.xxhash64("src"), F.lit(S)).cast("int"))
    )
    t = (
        posting_lists(tgt_text.select("uri", "text"), cfg.max_token_df)
        .withColumnRenamed("uri", "tgt")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1))))
    )
    return (
        _pin(s, "token", "salt")
        .join(_pin(t, "token", "salt"), ["token", "salt"])
        .select("src", "tgt")
        .distinct()
    )


def auto_hot_pairs_threshold(fanout_stats: DataFrame, n_partitions: int) -> int:
    """Tune the hot-token cutoff from the measured df distribution: a
    token is a straggler candidate when its single-key join output
    exceeds the MEAN PER-REDUCER output (total fan-out / reducers) — below
    that, the key fits inside one reducer's fair share and salting it only
    adds replication. ``fanout_stats`` must carry a ``fanout`` column
    (df_s * df_t per token). A 64k floor keeps fixture-scale runs from
    salting trivially small keys (semantics are identical either way;
    only shuffle layout changes)."""
    total = fanout_stats.agg(F.sum("fanout")).first()[0] or 0
    return max(int(total / max(n_partitions, 1)), 65536)


def hot_salted_blocking_join(
    src_text: DataFrame,
    tgt_text: DataFrame,
    cfg: PipelineConfig | None = None,
    hot_pairs_threshold: int | None = 1_000_000,
) -> DataFrame:
    """Targeted skew salting: salt ONLY the tokens whose join fan-out
    (df_src x df_tgt) exceeds ``hot_pairs_threshold``; everything else
    takes the plain equi-join. ``hot_pairs_threshold=None`` auto-tunes the
    cutoff from the measured fan-out distribution
    (:func:`auto_hot_pairs_threshold`: mean per-reducer output). Semantics
    identical to :func:`blocking_join`.

    Blanket vs targeted — the measured truth (tools/stress_skew.py across
    rounds 2-4): the crossover is the size of the REPLICATED side. Blanket
    salting replicates every target posting S-fold; on a corpus whose
    target posting table is small (the stress corpus: ~100k rows), that
    replication is nearly free and blanket can even win by skipping the
    detection pass + anti-joins this operator pays. At the 100 TB design
    point the target side is itself huge, S x its shuffle volume dominates
    everything, and targeted salting is the only shape that survives —
    which is why it stays the production default while the stress artifact
    records both under host-burn controls.

    AQE's skew-join can NOT fix this class of skew: it splits by shuffle
    partition input bytes, and a hot token's input (two posting lists) is
    small — the explosion is the join OUTPUT. Salting by source-uri hash
    splits the output itself."""
    cfg = cfg or PipelineConfig()
    S = cfg.salt_buckets
    # each posting list has THREE consumers (detection count, cold
    # anti-join, hot join) and ends in a distinct-shuffle — materialize
    # once so the explode+distinct runs once per side, not three times
    # (measured 1.6x on tools/stress_skew.py; exchange reuse does not
    # cover it because the consumers sit under different repartitions)
    s = materialize(
        posting_lists(src_text.select("uri", "text"), cfg.max_token_df)
        .withColumnRenamed("uri", "src")
    )
    t = materialize(
        posting_lists(tgt_text.select("uri", "text"), cfg.max_token_df)
        .withColumnRenamed("uri", "tgt")
    )
    # four consumers (two anti-joins + two hot joins) — materialize the
    # detection aggregate ONCE or each reference re-runs both per-token
    # counts (measured 4x slowdown without this)
    stats = materialize(
        s.groupBy("token")
        .agg(F.count("*").alias("df_s"))
        .join(t.groupBy("token").agg(F.count("*").alias("df_t")), "token")
        .withColumn("fanout", F.col("df_s") * F.col("df_t"))
        .select("token", "fanout")
    )
    if hot_pairs_threshold is None:
        try:
            n_parts = int(s.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            n_parts = s.sparkSession.sparkContext.defaultParallelism
        hot_pairs_threshold = auto_hot_pairs_threshold(stats, n_parts)
    hot = stats.filter(F.col("fanout") >= hot_pairs_threshold).select("token")
    cold = (
        _pin(s.join(F.broadcast(hot), "token", "left_anti"), "token")
        .join(_pin(t.join(F.broadcast(hot), "token", "left_anti"), "token"), "token")
        .select("src", "tgt")
    )
    s_hot = s.join(F.broadcast(hot), "token").withColumn(
        "salt", F.pmod(F.xxhash64("src"), F.lit(S)).cast("int")
    )
    t_hot = t.join(F.broadcast(hot), "token").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))
    )
    hot_pairs = (
        _pin(s_hot, "token", "salt")
        .join(_pin(t_hot, "token", "salt"), ["token", "salt"])
        .select("src", "tgt")
    )
    return cold.unionByName(hot_pairs).distinct()


def scored_pairs(
    pairs: DataFrame,
    src_text: DataFrame,
    tgt_text: DataFrame,
    src_emb: DataFrame,
    tgt_emb: DataFrame,
) -> DataFrame:
    """Attach (cos, ratio) scores to (src, tgt) pairs via broadcast lookups
    (the dict .get()s of thesis/generate_candidates.py:48-49,72-73,229)."""
    out = (
        pairs.join(
            F.broadcast(src_text.select(F.col("uri").alias("src"), F.col("text").alias("src_txt"))),
            "src",
        )
        .join(
            F.broadcast(tgt_text.select(F.col("uri").alias("tgt"), F.col("text").alias("tgt_txt"))),
            "tgt",
        )
        .join(
            F.broadcast(src_emb.select(F.col("uri").alias("src"), F.col("vec").alias("src_vec"))),
            "src",
        )
        .join(
            F.broadcast(tgt_emb.select(F.col("uri").alias("tgt"), F.col("vec").alias("tgt_vec"))),
            "tgt",
        )
    )
    return out.withColumn(
        "cos", cosine_pairs_udf(F.col("src_vec"), F.col("tgt_vec"))
    ).withColumn("ratio", partial_ratio_udf(F.col("src_txt"), F.col("tgt_txt")))


def generate_candidate_pairs(
    src_text: DataFrame,
    tgt_text: DataFrame,
    src_emb: DataFrame,
    tgt_emb: DataFrame,
    cfg: PipelineConfig | None = None,
    exhaustive: bool = False,
) -> DataFrame:
    """Threshold + per-source-top-k candidate generator
    (thesis/generate_candidates.py:57-77).

    The reference materializes the dense n×m cosine matrix (:60-62); the
    engine never does — candidates come from the token-blocking join
    (``exhaustive=False``, the scale path) or a cross join (parity path for
    small fixtures, semantics of the reference's all-pairs matrix).
    Top-k per source by cosine desc (tie-break tgt asc, deterministic), then
    thresholds — matching the reference's order: top-k first, then filters
    (:64-75).
    """
    cfg = cfg or PipelineConfig()
    if exhaustive:
        cand = (
            src_text.select(F.col("uri").alias("src"))
            .crossJoin(tgt_text.select(F.col("uri").alias("tgt")))
        )
    else:
        cand = blocking_join(src_text, tgt_text, cfg)
    scored = scored_pairs(cand, src_text, tgt_text, src_emb, tgt_emb)
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("tgt").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cfg.top_k)
        .filter(F.col("cos") >= cfg.min_cosine_sim)
        .filter(F.col("ratio") >= cfg.min_lexical_sim)
        .select("src", "tgt", "cos", "ratio")
    )


def generate_all_possible_pairs(src_text: DataFrame, tgt_text: DataFrame) -> DataFrame:
    """Cartesian src × tgt (thesis/generate_candidates.py:216-220).
    Fixture-scale only — O(n·m) by construction."""
    return src_text.select(F.col("uri").alias("src")).crossJoin(
        tgt_text.select(F.col("uri").alias("tgt"))
    )


def label_pairs(pairs: DataFrame, alignments: DataFrame) -> DataFrame:
    """Label (src, tgt) pairs 1/0 by symmetric membership in the alignment
    set (thesis/process_data_features.py:26-33 & generate_candidates.py:13-24):
    canonical least/greatest ordering, then a left join + flag."""
    lo, hi = (
        F.least(F.col("src"), F.col("tgt")),
        F.greatest(F.col("src"), F.col("tgt")),
    )
    ref = alignments.select(
        F.least(F.col("SrcEntity"), F.col("TgtEntity")).alias("lo"),
        F.greatest(F.col("SrcEntity"), F.col("TgtEntity")).alias("hi"),
        F.lit(1).alias("label"),
    ).distinct()
    return (
        pairs.withColumn("lo", lo)
        .withColumn("hi", hi)
        .join(F.broadcast(ref), ["lo", "hi"], "left")
        .select("src", "tgt", F.coalesce(F.col("label"), F.lit(0)).alias("label"))
    )


def cap_negatives(
    labeled: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Cap negatives at round(max_neg_per_pos × #positives) via the
    deterministic global sampler (thesis/generate_candidates.py:25-27's
    ``random.sample``, made reproducible)."""
    cfg = cfg or PipelineConfig()
    from ontology_mapping_spark.operators.sampling import sample_global

    # the counts, the sampler sort and the final union each consume this
    # frame — materialize once instead of re-running the candidate
    # dataflow 4x (session.materialize: leak-free local blocks by
    # default, conf-switchable to reliable checkpoints under churn).
    labeled = materialize(labeled)
    n_pos = labeled.filter(F.col("label") == 1).count()
    n_neg = labeled.filter(F.col("label") == 0).count()
    cap = int(round(min(n_neg, cfg.max_neg_per_pos * float(n_pos))))
    negs = sample_global(
        labeled.filter(F.col("label") == 0), ["src", "tgt"], cap, cfg.sample_seed
    )
    return labeled.filter(F.col("label") == 1).unionByName(negs)


def generate_candidates_with_negatives(
    ref_alignments: DataFrame,
    src_text: DataFrame,
    tgt_text: DataFrame,
    edges: DataFrame,
    closure: DataFrame,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """The manual negative generator
    (thesis/generate_candidates.py:79-154) as one dataflow:

    positives (label 1)
    ∪ IDF negatives: targets sharing >=1 source-label token
      (inverted-index probe :118-124), minus the true match, minus any
      reference pair (anti-join :130-131), <= idf_negatives per SOURCE
      (deterministic sample for :127).
    ∪ neighbour negatives: siblings of the true target (2-hop self-join
      :137-139), minus the target's ancestors (anti-join vs closure :141),
      minus reference pairs (:147-148), <= neighbour_negatives per SOURCE.

    Two documented divergences from the reference: duplicates across
    samplers are dropped (the reference may append the same negative
    twice; canonicalized to distinct), and the sampling caps are per
    SOURCE, not per alignment row — a non-1:1 source with k true targets
    gets each cap once, not k times (tests/oracle.py pins per-src as the
    canonical rule; sizing-relevant only for non-1:1 references).
    """
    cfg = cfg or PipelineConfig()
    # only Score==1.0 rows are positives (thesis/main.py:54-56); an
    # unfiltered OAEI TSV carries partial-score rows that must neither
    # train as matches nor be excluded from the negative pools
    if "Label" in ref_alignments.columns:
        ref_alignments = ref_alignments.filter(F.col("Label") == 1)
    elif "Score" in ref_alignments.columns:
        ref_alignments = ref_alignments.filter(F.col("Score") == 1.0)
    pos = ref_alignments.select(
        F.col("SrcEntity").alias("src"), F.col("TgtEntity").alias("tgt")
    ).distinct()
    ref_pairs = pos  # exclusion set (:106)

    # --- IDF negatives ------------------------------------------------------
    src_tok = (
        src_text.join(pos.select(F.col("src").alias("uri"), F.col("tgt").alias("true_tgt")), "uri")
        .select(F.col("uri").alias("src"), "true_tgt", F.explode(F.split("text", r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    tgt_tok = posting_lists(tgt_text, cfg.max_token_df).withColumnRenamed("uri", "tgt")
    idf_cand = (
        src_tok.join(tgt_tok, "token")
        .filter(F.col("tgt") != F.col("true_tgt"))  # discard true match (:124)
        .select("src", "tgt")
        .distinct()
        .join(ref_pairs, ["src", "tgt"], "left_anti")  # skip ref pairs (:130)
    )
    idf_neg = sample_per_group(
        idf_cand, ["src"], ["src", "tgt"], cfg.idf_negatives, cfg.sample_seed
    )

    # --- neighbour negatives -------------------------------------------------
    e1 = edges.select(F.col("child").alias("true_tgt"), F.col("parent"))
    e2 = edges.select(F.col("child").alias("sib"), F.col("parent"))
    sib = (
        pos.join(e1, pos["tgt"] == e1["true_tgt"])
        .join(e2, "parent")
        .filter(F.col("sib") != F.col("tgt"))  # discard true match (:140)
        .select("src", "tgt", F.col("sib"))
        .distinct()
    )
    # exclude ancestors of the true target (:141)
    anc = closure.select(F.col("node").alias("tgt"), F.col("ancestor").alias("sib"))
    sib = sib.join(anc, ["tgt", "sib"], "left_anti")
    sib = (
        sib.select("src", F.col("sib").alias("tgt"))
        .join(ref_pairs, ["src", "tgt"], "left_anti")  # :147-148
        .distinct()
    )
    nb_neg = sample_per_group(
        sib, ["src"], ["src", "tgt"], cfg.neighbour_negatives, cfg.sample_seed
    )

    out = (
        pos.withColumn("label", F.lit(1))
        .unionByName(idf_neg.withColumn("label", F.lit(0)))
        .unionByName(nb_neg.withColumn("label", F.lit(0)))
        .dropDuplicates(["src", "tgt", "label"])
    )
    return out


def select_training_pairs(
    pairs: DataFrame,
    src_text: DataFrame,
    tgt_text: DataFrame,
    src_emb: DataFrame,
    tgt_emb: DataFrame,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Post-hoc threshold filter over labeled pairs
    (thesis/generate_candidates.py:223-232)."""
    cfg = cfg or PipelineConfig()
    scored = scored_pairs(
        pairs.select("src", "tgt", "label"), src_text, tgt_text, src_emb, tgt_emb
    )
    return scored.filter(
        (F.col("ratio") >= cfg.min_lexical_sim) & (F.col("cos") >= cfg.min_cosine_sim)
    ).select("src", "tgt", "label")
