"""Pure-Python oracle re-implementing the reference's semantics verbatim
(networkx/dict/set based, mirroring /root/reference/thesis/*.py), with the
engine's documented canonicalizations applied:

* depths = max-over-parents longest path (vs the reference's
  order-dependent last-parent-wins, thesis/process_data_features.py:116-120);
* label lists sorted (prefLabels then synonyms);
* sampling via the md5-ordered deterministic rule shared with the engine.

The oracle consumes the same fixture lists the engine's DataFrames are built
from, so engine-vs-oracle comparisons are exact.
"""

from __future__ import annotations

from collections import defaultdict

import networkx as nx

from ontology_mapping_spark.fixtures import (
    P_EXACT,
    P_LABEL,
    P_SUBCLASS,
    P_SYNONYM,
    Fixture,
)
from ontology_mapping_spark.functions.fuzzy import levenshtein_py, partial_ratio_ref
from ontology_mapping_spark.functions.strings import token_jaccard_py
from ontology_mapping_spark.functions.vectors import cosine_py, embed_text_py
from ontology_mapping_spark.operators.sampling import md5_sample_key_py
from ontology_mapping_spark.textnorm import normalize_py


def extract_labels(triples: list[dict]) -> dict[str, list[str]]:
    """Reference semantics (thesis/process_data_features.py:12-24) with
    canonical ordering: sorted prefLabels first, then sorted synonyms."""
    pref: dict[str, list[str]] = defaultdict(list)
    syn: dict[str, list[str]] = defaultdict(list)
    for t in triples:
        if t["predicate"] == P_LABEL:
            pref[t["subject"]].append(t["object"].strip().lower())
        elif t["predicate"] == P_SYNONYM:
            syn[t["subject"]].append(t["object"].strip().lower())
    out = {}
    for uri in set(pref) | set(syn):
        out[uri] = sorted(pref.get(uri, [])) + sorted(syn.get(uri, []))
    return out


def extract_edges(triples: list[dict]) -> list[tuple[str, str]]:
    """(child, parent) from subClassOf (thesis/process_data_features.py:98-102)."""
    return sorted(
        {
            (t["subject"], t["object"])
            for t in triples
            if t["predicate"] == P_SUBCLASS
        }
    )


def build_graph(edges: list[tuple[str, str]]) -> nx.DiGraph:
    """parent -> child direction, as the reference builds it
    (thesis/process_data_features.py:112-115)."""
    g = nx.DiGraph()
    for child, parent in edges:
        g.add_edge(parent, child)
    return g


def ancestors(g: nx.DiGraph, node: str) -> set[str]:
    return set(nx.ancestors(g, node)) if node in g else set()


def depths_longest_path(g: nx.DiGraph) -> dict[str, int]:
    """Canonical max-over-parents depth (engine definition)."""
    depth: dict[str, int] = {}
    for node in nx.topological_sort(g):
        preds = list(g.predecessors(node))
        depth[node] = max((depth[p] + 1 for p in preds), default=0)
    return depth


def closure_with_dist(g: nx.DiGraph) -> dict[tuple[str, str], int]:
    """(node, ancestor) -> longest-path distance."""
    out: dict[tuple[str, str], int] = {}
    order = list(nx.topological_sort(g))
    longest: dict[str, dict[str, int]] = {n: {} for n in g}
    for node in order:
        for p in g.predecessors(node):
            cand = {p: 1}
            for anc, d in longest[p].items():
                cand[anc] = d + 1
            for anc, d in cand.items():
                cur = longest[node].get(anc)
                if cur is None or d > cur:
                    longest[node][anc] = d
    for node, m in longest.items():
        for anc, d in m.items():
            out[(node, anc)] = d
    return out


def siblings(g: nx.DiGraph, node: str) -> set[str]:
    """thesis/generate_candidates.py:137-140."""
    sibs: set[str] = set()
    for parent in g.predecessors(node):
        sibs.update(g.successors(parent))
    sibs.discard(node)
    return sibs


def connected_components_exact(edges: list[tuple[str, str]]) -> dict[str, str]:
    g = nx.Graph()
    g.add_edges_from(edges)
    out = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for n in comp:
            out[n] = root
    return out


def exact_match_edges(triples: list[dict]) -> list[tuple[str, str]]:
    return sorted(
        {
            (t["subject"], t["object"])
            for t in triples
            if t["predicate"] == P_EXACT
        }
    )


def label_text_map(labels: dict[str, list[str]]) -> dict[str, str]:
    return {u: normalize_py(" ".join(ls)) for u, ls in labels.items()}


def embeddings_map(labels: dict[str, list[str]], dim: int = 64) -> dict[str, list[float]]:
    """Engine-canonical deterministic embedding of the space-joined label
    list (role of thesis/main.py:48-58)."""
    texts = label_text_map(labels)
    return {u: embed_text_py(t, dim) for u, t in texts.items()}


def sample_deterministic(cands: set[tuple], keyparts, n: int, seed: int = 42):
    """Shared deterministic sampling rule: md5-ordered first-n."""
    ranked = sorted(cands, key=lambda c: md5_sample_key_py(keyparts(c), seed))
    return ranked[:n]


def generate_candidates_with_negatives(
    ref_rows: list[dict],
    src_labels: dict[str, list[str]],
    tgt_labels: dict[str, list[str]],
    edges: list[tuple[str, str]],
    closure: dict[tuple[str, str], int],
    idf_negatives: int = 50,
    neighbour_negatives: int = 50,
    seed: int = 42,
) -> set[tuple[str, str, int]]:
    """Oracle of thesis/generate_candidates.py:79-154 with the engine's
    canonical rules (distinct pairs, pre-sampling ref exclusion, md5 sample)."""
    g = build_graph(edges)
    src_text = label_text_map(src_labels)
    tgt_text = label_text_map(tgt_labels)

    inverted: dict[str, set[str]] = defaultdict(set)
    for tgt_uri, text in tgt_text.items():
        for w in text.split():
            inverted[w].add(tgt_uri)

    ref_pairs = {(r["SrcEntity"], r["TgtEntity"]) for r in ref_rows}
    out: set[tuple[str, str, int]] = set()

    # group positives per src (the engine samples per src)
    by_src: dict[str, list[str]] = defaultdict(list)
    for r in ref_rows:
        by_src[r["SrcEntity"]].append(r["TgtEntity"])

    for src_uri, true_tgts in by_src.items():
        for t in true_tgts:
            out.add((src_uri, t, 1))
        cands: set[str] = set()
        for w in src_text.get(src_uri, "").split():
            cands |= inverted.get(w, set())
        for t in true_tgts:
            cands.discard(t)
        cands = {c for c in cands if (src_uri, c) not in ref_pairs}
        for c in sample_deterministic(
            cands, lambda c: [src_uri, c], idf_negatives, seed
        ):
            out.add((src_uri, c, 0))

        # neighbour negatives per positive tgt
        sib_cands: set[str] = set()
        for t in true_tgts:
            sibs = siblings(g, t)
            anc_t = ancestors(g, t)
            sibs = {s for s in sibs if s not in anc_t and s != t}
            sib_cands |= sibs
        sib_cands = {c for c in sib_cands if (src_uri, c) not in ref_pairs}
        for c in sample_deterministic(
            sib_cands, lambda c: [src_uri, c], neighbour_negatives, seed
        ):
            out.add((src_uri, c, 0))
    # engine dedups (src,tgt,label); a pair can't be both 1 and 0 here since
    # ref pairs are excluded from negatives
    return out


def compute_features(
    labeled_pairs,
    concept_labels: dict[str, list[str]],
    embeddings: dict[str, list[float]],
    edges: list[tuple[str, str]],
    src_labels: dict[str, list[str]],
    tgt_labels: dict[str, list[str]],
    ablation: bool = False,
) -> list[dict]:
    """Oracle of thesis/process_data_features.py:111-180 (canonical depth)."""
    g = build_graph(edges)
    depth = depths_longest_path(g)
    max_d_src = max((depth.get(c, 0) for c in src_labels), default=0)
    max_d_tgt = max((depth.get(c, 0) for c in tgt_labels), default=0)
    text = label_text_map(concept_labels)

    def norm_depth(c):
        d = depth.get(c, 0)
        if c in src_labels:
            return d / max_d_src if max_d_src > 0 else 0.0
        if c in tgt_labels:
            return d / max_d_tgt if max_d_tgt > 0 else 0.0
        return 0.0

    rows = []
    for c1, c2, label in labeled_pairs:
        l1 = text.get(c1, "")
        l2 = text.get(c2, "")
        e1, e2 = embeddings.get(c1), embeddings.get(c2)
        if e1 is None or e2 is None:
            continue
        anc1, anc2 = ancestors(g, c1), ancestors(g, c2)
        union = anc1 | anc2
        jac_anc = len(anc1 & anc2) / len(union) if union else 0.0
        t1, t2 = set(l1.split()), set(l2.split())
        shared = len(t1 & t2)
        row = {
            "src": c1,
            "tgt": c2,
            "exact_string_match": float(l1 == l2),
            "partial_string_match": partial_ratio_ref(l1, l2),
            "weighted_jaccard": token_jaccard_py(l1, l2),
            "cosine_similarity": cosine_py(e1, e2),
            "levenshtein_distance": float(levenshtein_py(l1, l2)),
            "depth_difference": float(abs(depth.get(c1, 0) - depth.get(c2, 0))),
            "norm_depth_difference": abs(norm_depth(c1) - norm_depth(c2)),
            "ancestor_jaccard": jac_anc,
            "label": label,
        }
        if not ablation:
            row.update(
                {
                    "shared_tokens_count": float(shared),
                    "token_ratio_c1": shared / len(t1) if t1 else 0.0,
                    "token_ratio_c2": shared / len(t2) if t2 else 0.0,
                }
            )
        rows.append(row)
    return rows


def gold_mention_triples(fx: Fixture, predicate: str = "kg:mentionedIn"):
    """Expected (subject, predicate, object) triples for the degenerate S3
    slice: concept mentioned-in url, from planted gold mentions."""
    return {(uri, predicate, url) for url, uri in fx.gold_mentions}
