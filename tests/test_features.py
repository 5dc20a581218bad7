"""Pairwise feature computation vs pure-Python oracle (exact per-column)."""

import math

from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig
from ontology_mapping_spark.functions.vectors import make_embed_udf
from ontology_mapping_spark.operators import graph as G
from ontology_mapping_spark.operators.blocking import generate_candidates_with_negatives
from ontology_mapping_spark.operators.features import compute_features
from ontology_mapping_spark.operators.labels import (
    extract_hierarchy,
    extract_labels,
    label_text,
)
from ontology_mapping_spark.schemas import FEATURE_COLS
from tests import oracle

DIM = 32


def _setup(spark, fx, fx_dfs):
    labels_df = extract_labels(fx_dfs["triples"])
    lt = label_text(labels_df).cache()
    edges_df = extract_hierarchy(fx_dfs["triples"])
    closure_df = G.transitive_closure(edges_df).cache()
    depths_df = G.depths(edges_df, closure_df).cache()
    emb_df = lt.select("uri", make_embed_udf(DIM)(F.col("text")).alias("vec")).cache()
    cfg = PipelineConfig(idf_negatives=5, neighbour_negatives=3, embedding_dim=DIM)
    pairs = generate_candidates_with_negatives(
        fx_dfs["align_train"],
        lt.filter("side = 'src'"),
        lt.filter("side = 'tgt'"),
        edges_df,
        closure_df,
        cfg,
    ).cache()
    return lt, edges_df, closure_df, depths_df, emb_df, pairs, cfg


def test_features_match_oracle(spark, fx, fx_dfs):
    lt, edges_df, closure_df, depths_df, emb_df, pairs, cfg = _setup(spark, fx, fx_dfs)
    got_df = compute_features(pairs, lt, emb_df, depths_df, closure_df, cfg)
    got = {(r["src"], r["tgt"]): r.asDict() for r in got_df.collect()}

    labels = oracle.extract_labels(fx.triples)
    src = {u: v for u, v in labels.items() if u.startswith("src:")}
    tgt = {u: v for u, v in labels.items() if u.startswith("tgt:")}
    edges = oracle.extract_edges(fx.triples)
    emb = oracle.embeddings_map(labels, DIM)
    pair_list = [(r["src"], r["tgt"], r["label"]) for r in pairs.collect()]
    want_rows = oracle.compute_features(pair_list, labels, emb, edges, src, tgt)
    want = {(r["src"], r["tgt"]): r for r in want_rows}

    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        for col in FEATURE_COLS + ["label"]:
            # 1e-6: engine vectors round-trip through float32 parquet/arrow
            assert math.isclose(
                g[col], w[col], rel_tol=1e-6, abs_tol=1e-6
            ), f"{key} {col}: got {g[col]} want {w[col]}"


def test_features_ablation_drops_token_stats(spark, fx, fx_dfs):
    lt, edges_df, closure_df, depths_df, emb_df, pairs, cfg = _setup(spark, fx, fx_dfs)
    df = compute_features(pairs, lt, emb_df, depths_df, closure_df, cfg, ablation=True)
    assert "shared_tokens_count" not in df.columns
    assert "token_ratio_c1" not in df.columns
    assert "weighted_jaccard" in df.columns


def test_cosine_udf_survives_ragged_and_empty_vectors(spark):
    # a single corrupt/empty embedding must score 0.0 (like cosine_py),
    # not crash the whole Arrow batch via np.stack
    from ontology_mapping_spark.functions.vectors import cosine_pairs_udf, cosine_py

    rows = [
        (0, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        (1, [], [1.0, 2.0, 3.0]),
        (2, [1.0, 0.0], [0.0, 1.0]),          # different dim than row 0
        (3, None, [1.0, 2.0, 3.0]),
        (4, [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "i long, a array<double>, b array<double>")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", cosine_pairs_udf(F.col("a"), F.col("b")).alias("c")).collect()
    }
    assert abs(got[0] - 1.0) < 1e-12
    assert got[1] == 0.0 and got[3] == 0.0 and got[4] == 0.0
    assert abs(got[2] - cosine_py([1.0, 0.0], [0.0, 1.0])) < 1e-12


def test_partial_ratio_exact_against_brute_force():
    # property: for label-length strings the partial ratio equals the true
    # max over every same-length window (canonical argument order fixed)
    import random
    from difflib import SequenceMatcher

    from ontology_mapping_spark.functions.fuzzy import partial_ratio_py

    def brute(a, b):
        if not a or not b:
            return 0.0
        s, l = (a, b) if len(a) <= len(b) else (b, a)
        m, n = len(s), len(l)
        return max(
            2.0
            * sum(
                sz
                for _, _, sz in SequenceMatcher(
                    None, l[st : st + m], s, autojunk=False
                ).get_matching_blocks()
            )
            / (2 * m)
            for st in range(n - m + 1)
        )

    rng = random.Random(7)
    for _ in range(3000):
        a = "".join(rng.choices("abcde ", k=rng.randint(1, 12)))
        b = "".join(rng.choices("abcdefg ", k=rng.randint(1, 20)))
        assert abs(partial_ratio_py(a, b) - brute(a, b)) < 1e-12, (a, b)


def test_partial_ratio_rapidfuzz_seam_equivalence():
    """Optional-import seam (VERDICT r3 #2): when rapidfuzz ships, the
    batch path must agree with it exactly, and on the window-exhaustive
    branch the difflib fallback is a lower bound (block sum <= LCS) that
    coincides on block-optimal pairs. Skip-clean without the C lib."""
    import random

    import pytest

    from ontology_mapping_spark.functions.fuzzy import (
        partial_ratio_batch,
        partial_ratio_py,
        partial_ratio_ref,
        rapidfuzz_available,
    )

    # the seam itself: ref==py and batch==py when rapidfuzz is absent
    if not rapidfuzz_available():
        pairs = [("kinase", "protein kinase"), ("ab", "ba"), ("", "x")]
        for a, b in pairs:
            assert partial_ratio_ref(a, b) == partial_ratio_py(a, b)
        assert partial_ratio_batch(*zip(*pairs)) == [
            partial_ratio_py(a, b) for a, b in pairs
        ]
        pytest.skip("rapidfuzz not installed; fallback identity verified")

    from rapidfuzz import fuzz  # type: ignore

    # block-optimal pairs: difflib's decomposition attains the LCS, so the
    # two kernels must agree exactly (all are window-exhaustive: len gap<=64)
    exact_pairs = [
        ("protein kinase", "protein kinase"),
        ("kinase", "protein kinase c"),
        ("abc", "xyz"),
        ("ab", "ba"),
        ("abcd", "bcda"),
        ("alpha receptor", "alpha"),
    ]
    for a, b in exact_pairs:
        rf = fuzz.partial_ratio(a, b) / 100.0
        assert abs(partial_ratio_py(a, b) - rf) < 1e-9, (a, b)
        assert abs(partial_ratio_ref(a, b) - rf) < 1e-9, (a, b)

    # batch path == per-pair rapidfuzz on random label-like strings
    rng = random.Random(11)
    a_vals = ["".join(rng.choices("abcde ", k=rng.randint(0, 12))) for _ in range(200)]
    b_vals = ["".join(rng.choices("abcdefg ", k=rng.randint(0, 20))) for _ in range(200)]
    got = partial_ratio_batch(a_vals, b_vals)
    for a, b, g in zip(a_vals, b_vals, got):
        want = (fuzz.partial_ratio(a, b) / 100.0) if a and b else 0.0
        assert abs(g - want) < 1e-9, (a, b)
        # lower-bound invariant on the exhaustive branch
        assert partial_ratio_py(a, b) <= want + 1e-9, (a, b)


def test_ancestor_pair_stats_duplicate_pairs_not_inflated(spark):
    """Duplicate (src, tgt) input rows must not inflate shared_anc (the
    stat dedups pair keys first) and each input row still gets exactly
    one stats row back."""
    from ontology_mapping_spark.operators.features import ancestor_pair_stats

    closure = spark.createDataFrame(
        [("x", "r"), ("x", "m"), ("y", "r"), ("y", "m")],
        "node string, ancestor string",
    )
    pairs = spark.createDataFrame(
        [("x", "y"), ("x", "y"), ("x", "y")], "src string, tgt string"
    )
    rows = ancestor_pair_stats(pairs, closure).collect()
    assert len(rows) == 3  # one output row per input row, no blowup
    assert all(r["shared_anc"] == 2 for r in rows)
    assert all(r["n_anc_src"] == 2 and r["n_anc_tgt"] == 2 for r in rows)
