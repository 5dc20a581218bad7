"""Candidate generation + labeling + sampling vs oracle."""

from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig
from ontology_mapping_spark.functions.vectors import make_embed_udf
from ontology_mapping_spark.operators import graph as G
from ontology_mapping_spark.operators.blocking import (
    blocking_join,
    cap_negatives,
    generate_candidates_with_negatives,
    label_pairs,
    salted_blocking_join,
)
from ontology_mapping_spark.operators.labels import (
    extract_hierarchy,
    extract_labels,
    label_text,
)
from tests import oracle


def _sides(spark, fx_dfs):
    labels_df = extract_labels(fx_dfs["triples"])
    lt = label_text(labels_df).cache()
    return lt, lt.filter("side = 'src'"), lt.filter("side = 'tgt'")


def test_blocking_join_matches_oracle(spark, fx, fx_dfs):
    _, src_t, tgt_t = _sides(spark, fx_dfs)
    got = {(r["src"], r["tgt"]) for r in blocking_join(src_t, tgt_t).collect()}
    labels = oracle.extract_labels(fx.triples)
    src = {u: v for u, v in labels.items() if u.startswith("src:")}
    tgt = {u: v for u, v in labels.items() if u.startswith("tgt:")}
    st = oracle.label_text_map(src)
    tt = oracle.label_text_map(tgt)
    want = {
        (s, t)
        for s, sx in st.items()
        for t, tx in tt.items()
        if set(sx.split()) & set(tx.split())
    }
    assert got == want
    # salted variant must be semantically identical
    got_salted = {
        (r["src"], r["tgt"]) for r in salted_blocking_join(src_t, tgt_t).collect()
    }
    assert got_salted == want


def test_negatives_generation_matches_oracle(spark, fx, fx_dfs):
    lt, src_t, tgt_t = _sides(spark, fx_dfs)
    edges_df = extract_hierarchy(fx_dfs["triples"])
    closure_df = G.transitive_closure(edges_df).cache()
    cfg = PipelineConfig(idf_negatives=7, neighbour_negatives=3)
    got = {
        (r["src"], r["tgt"], r["label"])
        for r in generate_candidates_with_negatives(
            fx_dfs["align_train"], src_t, tgt_t, edges_df, closure_df, cfg
        ).collect()
    }
    labels = oracle.extract_labels(fx.triples)
    src = {u: v for u, v in labels.items() if u.startswith("src:")}
    tgt = {u: v for u, v in labels.items() if u.startswith("tgt:")}
    edges = oracle.extract_edges(fx.triples)
    want = oracle.generate_candidates_with_negatives(
        fx.alignments_train, src, tgt, edges, None,
        idf_negatives=7, neighbour_negatives=3, seed=cfg.sample_seed,
    )
    assert got == want


def test_label_pairs_symmetric(spark, fx_dfs):
    pairs = spark.createDataFrame(
        [("src:C0001", "tgt:C0001"), ("tgt:C0002", "src:C0002"), ("src:C0001", "tgt:C0099")],
        "src string, tgt string",
    )
    got = {
        (r["src"], r["tgt"]): r["label"]
        for r in label_pairs(pairs, fx_dfs["align_train"]).collect()
    }
    # C0001/C0002 are train positives (i%10<7); symmetric order must match too
    assert got[("src:C0001", "tgt:C0001")] == 1
    assert got[("tgt:C0002", "src:C0002")] == 1
    assert got[("src:C0001", "tgt:C0099")] == 0


def test_cap_negatives_deterministic(spark):
    rows = [("s%d" % i, "t%d" % i, 1 if i < 4 else 0) for i in range(30)]
    df = spark.createDataFrame(rows, "src string, tgt string, label int")
    cfg = PipelineConfig(max_neg_per_pos=2.0)
    out1 = cap_negatives(df, cfg)
    out2 = cap_negatives(df, cfg)
    s1 = {(r["src"], r["tgt"], r["label"]) for r in out1.collect()}
    s2 = {(r["src"], r["tgt"], r["label"]) for r in out2.collect()}
    assert s1 == s2
    assert sum(1 for x in s1 if x[2] == 1) == 4
    assert sum(1 for x in s1 if x[2] == 0) == 8  # 2 × positives


def test_hot_salted_blocking_join_equivalent(spark):
    from pyspark.sql import functions as F

    from ontology_mapping_spark.config import PipelineConfig
    from ontology_mapping_spark.operators.blocking import (
        blocking_join,
        hot_salted_blocking_join,
        salted_blocking_join,
    )

    src = spark.range(300).select(
        F.concat(F.lit("s"), F.col("id")).alias("uri"),
        F.when(F.col("id") % 3 == 0, F.concat(F.lit("hot x"), F.col("id")))
        .otherwise(F.concat(F.lit("u"), F.col("id") % 40, F.lit(" x"), F.col("id")))
        .alias("text"),
    )
    tgt = spark.range(200).select(
        F.concat(F.lit("t"), F.col("id")).alias("uri"),
        F.when(F.col("id") % 2 == 0, F.concat(F.lit("hot y"), F.col("id")))
        .otherwise(F.concat(F.lit("u"), F.col("id") % 40, F.lit(" y"), F.col("id")))
        .alias("text"),
    )
    cfg = PipelineConfig(max_token_df=None, salt_buckets=4)
    plain = {(r["src"], r["tgt"]) for r in blocking_join(src, tgt, cfg).collect()}
    # threshold 100: 'hot' (100x100 fan-out = 10000) salts, 'u*' tokens don't
    hot_salted = {
        (r["src"], r["tgt"])
        for r in hot_salted_blocking_join(src, tgt, cfg, hot_pairs_threshold=100).collect()
    }
    blanket = {
        (r["src"], r["tgt"]) for r in salted_blocking_join(src, tgt, cfg).collect()
    }
    assert hot_salted == plain == blanket and plain
    # auto-tuned cutoff (None -> mean per-reducer fan-out): semantics must
    # stay identical whatever threshold the tuner picks
    auto = {
        (r["src"], r["tgt"])
        for r in hot_salted_blocking_join(
            src, tgt, cfg, hot_pairs_threshold=None
        ).collect()
    }
    assert auto == plain


def test_auto_hot_pairs_threshold(spark):
    from pyspark.sql import functions as F

    from ontology_mapping_spark.operators.blocking import auto_hot_pairs_threshold

    stats = spark.createDataFrame(
        [("a", 1_000_000), ("b", 9_000_000), ("c", 22_000_000)],
        "token string, fanout long",
    )
    # mean per-reducer output: 32M total / 8 reducers = 4M
    assert auto_hot_pairs_threshold(stats, 8) == 4_000_000
    # floor: tiny corpora never salt
    assert auto_hot_pairs_threshold(stats.filter(F.col("fanout") < 0), 8) == 65536


def test_posting_lists_df_cap_zero_drops_everything(spark):
    """max_token_df=0 means 'drop tokens with document frequency above
    0' — i.e. every token — not 'no cap' (the falsy-zero trap): a
    silently skipped cap lets stop-word-hot tokens into the blocking
    join, the exact skew hazard the cap exists for."""
    from ontology_mapping_spark.operators.blocking import posting_lists

    lt = spark.createDataFrame(
        [("u1", "alpha beta"), ("u2", "beta gamma")], "uri string, text string"
    )
    assert posting_lists(lt, max_token_df=0).count() == 0
    assert posting_lists(lt, max_token_df=None).count() == 4
    # df cap 1 keeps only the df-1 tokens (beta has df 2)
    kept = {r["token"] for r in posting_lists(lt, max_token_df=1).collect()}
    assert kept == {"alpha", "gamma"}
