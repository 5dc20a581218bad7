"""Explicit StructType schemas for every table in the engine.

The reference's data model is implicit/duck-typed (dicts, pandas inference,
SURVEY.md §1.2); here every table has a fixed schema and inference is banned
for determinism. Table shapes cite the reference structure they re-express.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- north-star input table (BASELINE.json input_hint) --------------------
WEB_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# --- flattened ontology (reference: rdflib.Graph, thesis/main.py:37-41) ---
TRIPLES = T.StructType(
    [
        T.StructField("subject", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
    ]
)

# concept -> label list (reference: dict, thesis/process_data_features.py:12-24)
LABELS = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
        T.StructField("side", T.StringType(), True),  # "src" | "tgt"
    ]
)

# hierarchy edges, child `broader` parent
# (reference: list of Subject/Predicate/Object dicts,
#  thesis/process_data_features.py:98-102)
EDGES = T.StructType(
    [
        T.StructField("child", T.StringType(), False),
        T.StructField("parent", T.StringType(), False),
    ]
)

# transitive-closure ancestor table (reference: nx.ancestors per call,
# thesis/process_data_features.py:127-128 — here materialized once)
ANCESTORS = T.StructType(
    [
        T.StructField("node", T.StringType(), False),
        T.StructField("ancestor", T.StringType(), False),
        T.StructField("dist", T.IntegerType(), False),  # longest-path hops
    ]
)

DEPTHS = T.StructType(
    [
        T.StructField("node", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
    ]
)

# uri -> dense embedding (reference: dict of np.ndarray, thesis/main.py:48-58)
EMBEDDINGS = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("vec", T.ArrayType(T.FloatType()), False),
    ]
)

# reference alignments TSV shape (thesis/main.py:53-62)
ALIGNMENTS = T.StructType(
    [
        T.StructField("SrcEntity", T.StringType(), False),
        T.StructField("TgtEntity", T.StringType(), False),
        T.StructField("Score", T.DoubleType(), True),
    ]
)

# candidate pairs (reference: list of tuples, thesis/generate_candidates.py:109-153)
PAIRS = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("tgt", T.StringType(), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

# pairwise feature row (thesis/process_data_features.py:161-177); snake_case
# aliases of the reference's column names
FEATURE_COLS = [
    "shared_tokens_count",
    "token_ratio_c1",
    "token_ratio_c2",
    "exact_string_match",
    "partial_string_match",
    "weighted_jaccard",
    "cosine_similarity",
    "levenshtein_distance",
    "depth_difference",
    "norm_depth_difference",
    "ancestor_jaccard",
]

FEATURES = T.StructType(
    [T.StructField("src", T.StringType(), False), T.StructField("tgt", T.StringType(), False)]
    + [T.StructField(c, T.DoubleType(), True) for c in FEATURE_COLS]
    + [T.StructField("label", T.IntegerType(), False)]
)

# emitted knowledge-graph triples (shape of thesis/process_data_features.py:101)
OUT_TRIPLES = T.StructType(
    [
        T.StructField("subject", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
    ]
)

# mention occurrences in pages (engine-side; the degenerate S3 slice)
MENTIONS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("uri", T.StringType(), False),  # matched concept
        T.StructField("surface", T.StringType(), False),
        T.StructField("n_hits", T.IntegerType(), False),
    ]
)
