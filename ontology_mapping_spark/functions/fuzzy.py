"""Fuzzy string similarity: partial_ratio as a vectorized pandas UDF.

The reference calls ``rapidfuzz.fuzz.partial_ratio`` per pair
(thesis/process_data_features.py:168, thesis/generate_candidates.py:50,74,228).
rapidfuzz is a C extension that is not part of this sandbox's dependency
set, so it is an OPTIONAL-IMPORT SEAM (the Pillow/spaCy pattern): when
``rapidfuzz`` is importable the UDF scores whole Arrow batches through its
C kernel (``process.cpdist`` — element-wise, zero per-pair Python) and is
reference-exact; otherwise the engine uses its canonical pure-Python
partial-ratio: the maximum similarity-ratio of the shorter string against
any same-length window of the longer one, with ratio = 2*M/(len_a+len_b)
over difflib matching blocks (autojunk off) — the original fuzzywuzzy
definition. Values are in [0, 1] after the reference's /100 scaling
(thesis/process_data_features.py:168).

The pytest oracle imports :func:`partial_ratio_ref` — the SAME seam — so
engine == oracle by construction in both worlds. On the window-exhaustive
branch difflib's block sum is a lower bound on the LCS rapidfuzz optimizes,
so ``partial_ratio_py <= rapidfuzz.partial_ratio/100`` there (pinned by a
skip-clean equivalence test); divergence is documented, not hidden.

Scale note: per-pair Python is the slow path; it runs as an Arrow-batched
pandas UDF (one Python call per ~10k-row batch, not per row). With
rapidfuzz shipped via --py-files the inner work is C too; the difflib
fallback is the one interpreter-bound kernel left in the engine.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RF = None
_RF_TRIED = False


def _rapidfuzz_partial_ratio():
    """``rapidfuzz.fuzz.partial_ratio`` when importable, else None.
    Probed once per process (executor-side too — the module-level cache
    is per Python worker, same as the spaCy model slot)."""
    global _RF, _RF_TRIED
    if not _RF_TRIED:
        _RF_TRIED = True
        try:
            from rapidfuzz import fuzz as _fuzz  # type: ignore

            _RF = _fuzz.partial_ratio
        except Exception:
            _RF = None
    return _RF


def rapidfuzz_available() -> bool:
    return _rapidfuzz_partial_ratio() is not None


def _ratio(matcher: SequenceMatcher, len_a: int, len_b: int) -> float:
    matches = sum(size for _, _, size in matcher.get_matching_blocks())
    total = len_a + len_b
    return (2.0 * matches / total) if total else 1.0


def partial_ratio_py(a: str | None, b: str | None) -> float:
    """Canonical partial ratio in [0, 1]. Empty/None behaves like rapidfuzz:
    both empty -> 1.0 is NOT rapidfuzz (it gives 0 for empty); we return 0.0
    when either side is empty, matching rapidfuzz's observable behavior."""
    a = a or ""
    b = b or ""
    if not a or not b:
        return 0.0
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    m, n = len(shorter), len(longer)
    if m == n:
        # canonical argument order (window-side first, shorter second):
        # difflib's block decomposition is NOT symmetric in its arguments,
        # so one order is fixed across all branches
        sm = SequenceMatcher(None, longer, shorter, autojunk=False)
        return _ratio(sm, n, m)
    # exact for short strings (ontology labels): every window is scored.
    # For long inputs fall back to candidate windows from matching blocks
    # (rapidfuzz-style alignment: block (i, j) pairs shorter[i] with
    # longer[j] -> window start j - i, clamped), plus window 0 — a
    # documented approximation that may under-report on adversarial text.
    if n - m <= 64:
        starts = set(range(n - m + 1))
    else:
        sm = SequenceMatcher(None, shorter, longer, autojunk=False)
        starts = {0}
        for i, j, _size in sm.get_matching_blocks():
            starts.add(max(0, min(j - i, n - m)))
    best = 0.0
    # SequenceMatcher caches seq2's char index — keep the constant shorter
    # string in seq2 and swap only the window through set_seq1
    matcher = SequenceMatcher(None, "", shorter, autojunk=False)
    for s in sorted(starts):
        window = longer[s : s + m]
        matcher.set_seq1(window)
        r = _ratio(matcher, len(window), m)
        if r > best:
            best = r
            if best == 1.0:
                break
    return best


def partial_ratio_ref(a: str | None, b: str | None) -> float:
    """Reference-exact scorer when rapidfuzz is importable, canonical
    Python definition otherwise. The pytest oracle imports THIS, so
    engine == oracle under either kernel."""
    rf = _rapidfuzz_partial_ratio()
    if rf is not None:
        return rf(a or "", b or "") / 100.0
    return partial_ratio_py(a, b)


def partial_ratio_batch(a_vals: list, b_vals: list) -> list[float]:
    """Score parallel lists of pairs. rapidfuzz path: one C call for the
    whole batch (``process.cpdist`` element-wise, multithread-free —
    Spark owns the cores); fallback: per-pair difflib."""
    rf = _rapidfuzz_partial_ratio()
    if rf is not None:
        a_vals = [x or "" for x in a_vals]
        b_vals = [y or "" for y in b_vals]
        try:
            from rapidfuzz.process import cpdist  # type: ignore

            return (cpdist(a_vals, b_vals, scorer=rf) / 100.0).tolist()
        except Exception:
            return [rf(x, y) / 100.0 for x, y in zip(a_vals, b_vals)]
    return [partial_ratio_py(x, y) for x, y in zip(a_vals, b_vals)]


@F.pandas_udf(T.DoubleType())
def partial_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        partial_ratio_batch(a.tolist(), b.tolist()), dtype="float64"
    )


def levenshtein_py(a: str, b: str) -> int:
    """Pure-Python Levenshtein (oracle twin of Spark's built-in
    ``F.levenshtein``; reference: rapidfuzz distance.Levenshtein.distance,
    thesis/process_data_features.py:171)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
