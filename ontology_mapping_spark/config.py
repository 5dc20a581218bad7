"""Pipeline configuration — one dataclass mirroring the reference's knobs.

Reference knob origins:
  top_k / min_lexical_sim / min_cosine_sim  thesis/generate_candidates.py:57
  idf_negatives / neighbour_negatives=50    thesis/main.py:70-71
  max_neg_per_pos=2                         thesis/generate_candidates.py:25
  seeds [42,56,25,111,4]                    thesis/main.py:121
  voting weights                            thesis/main.py:116
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # candidate generation
    top_k: int = 10
    min_lexical_sim: float = 0.0  # partial-ratio threshold, 0..1 scale
    min_cosine_sim: float = 0.0
    idf_negatives: int = 50
    neighbour_negatives: int = 50
    max_neg_per_pos: float = 2.0
    # embeddings (deterministic hashed bag-of-words stand-in for spaCy)
    embedding_dim: int = 64
    # ML
    seed: int = 42
    voting_weights: tuple[float, float, float] = (1.0, 1.0, 2.0)
    decision_threshold: float = 0.5
    n_estimators: int = 100  # GBT maxIter / RF numTrees (thesis/main.py:99-101)
    # scale knobs
    salt_buckets: int = 8          # skew-key salting fan-out for hot tokens
    max_token_df: int = 1000       # drop blocking tokens hotter than this
    closure_max_iters: int = 20    # path-doubling: supports depth <= 2^20
    # determinism
    sample_seed: int = 42

    predicates: dict[str, str] = field(
        default_factory=lambda: {
            "label": "rdfs:label",
            "synonym": "obo:hasExactSynonym",
            "subclass": "rdfs:subClassOf",
            "exact_match": "skos:exactMatch",
            "mentions": "kg:mentionedIn",
            "same_as": "kg:sameAs",
        }
    )
