"""Compile-on-first-use ctypes bridge for the C Aho-Corasick scanner.

No pip, no build system: if a C compiler is present (gcc/cc), acscan.c is
compiled once into a per-source-hash shared object under
``~/.cache/ontology_mapping_spark/``; every later import (including Spark
executor workers on the same host) dlopens the cached .so. If anything
fails — no compiler, sandboxed filesystem, exotic platform — callers get
``None`` and fall back to the pure-Python kernels, so the C path is a
pure acceleration, never a dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "acscan.c")
_LIB = None
_TRIED = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "ontology_mapping_spark")


def _compile() -> str | None:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    d = _cache_dir()
    so = os.path.join(d, f"acscan_{tag}.so")
    if os.path.exists(so):
        return so
    cc = None
    for cand in ("cc", "gcc", "clang"):
        try:
            subprocess.run([cand, "--version"], capture_output=True, check=True)
            cc = cand
            break
        except (OSError, subprocess.CalledProcessError):
            continue
    if cc is None:
        return None
    os.makedirs(d, exist_ok=True)
    # build into a temp name then atomically rename: concurrent executor
    # workers may race on first use
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=d)
    os.close(fd)
    try:
        subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            capture_output=True,
            check=True,
        )
        os.replace(tmp, so)
        return so
    except (OSError, subprocess.CalledProcessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def load_acscan():
    """ctypes handle to the compiled scanner, or None (use Python kernels)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        so = _compile()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.ac_build.restype = ctypes.c_void_p
        lib.ac_build.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
        ]
        lib.ac_scan.restype = None
        lib.ac_scan.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ac_free.restype = None
        lib.ac_free.argtypes = [ctypes.c_void_p]
        lib.ac_scan_multi.restype = ctypes.c_int64
        lib.ac_scan_multi.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.ac_scan_multi_fold.restype = ctypes.c_int64
        lib.ac_scan_multi_fold.argtypes = lib.ac_scan_multi.argtypes
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


class NativeMatcher:
    """Padded-phrase automaton over the C scanner.

    ``phrase_rows``: (uri, phrase) pairs, whitespace-canonicalized and
    (uri, phrase)-deduplicated first (the shared kernel contract —
    operators/mentions.py canonical_phrase_rows), so every kernel matches
    the canonical token sequence, emits the canonical surface, and counts
    each key once however the input was duplicated. Duplicate phrases
    across uris share one pattern whose hits fan back out to every key.
    """

    def __init__(self, phrase_rows):
        import numpy as np

        lib = load_acscan()
        if lib is None:
            raise RuntimeError("native scanner unavailable")
        self._lib = lib
        words: dict[bytes, list] = {}
        seen: set = set()
        for uri, phrase in phrase_rows:
            phrase = " ".join(phrase.split())
            if phrase and (uri, phrase) not in seen:
                seen.add((uri, phrase))
                words.setdefault(
                    (" " + phrase + " ").encode("utf-8"), []
                ).append((uri, phrase))
        self._keys: list[list] = list(words.values())
        pats = list(words.keys())
        self._n = len(pats)
        buf = b"".join(pats)
        offs = np.zeros(self._n + 1, dtype=np.int64)
        pos = 0
        for i, p in enumerate(pats):
            pos += len(p)
            offs[i + 1] = pos
        self._buf = buf  # keep alive
        self._np = np
        self._ac = lib.ac_build(
            buf,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int32(self._n),
        )
        if not self._ac:
            raise RuntimeError("ac_build failed")
        self._counts = np.zeros(max(self._n, 1), dtype=np.int32)
        # lazy flat key arrays for expand_hits (built on first use)
        self._flat_uris = None
        self._flat_phrases = None
        self._key_counts = None
        self._key_offs = None

    def scan_tokens(self, toks: list[str]) -> dict:
        out: dict = {}
        if not toks or self._n == 0:
            return out
        np = self._np
        text = (" " + " ".join(toks) + " ").encode("utf-8")
        counts = self._counts
        counts[:] = 0
        self._lib.ac_scan(
            self._ac,
            text,
            ctypes.c_int64(len(text)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        for i in np.nonzero(counts)[0]:
            c = int(counts[i])
            for key in self._keys[i]:
                out[key] = c
        return out

    def _scan_concat(self, parts, fn):
        """One C call (``fn``) over concatenated per-page byte buffers;
        returns unique (page_idx, pat_idx, counts) int64 arrays."""
        np = self._np
        offs = np.zeros(len(parts) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in parts], out=offs[1:])
        buf = b"".join(parts)
        cap = max(4 * len(parts), 4096)
        while True:
            out = np.empty(2 * cap, dtype=np.int32)
            n = fn(
                self._ac,
                buf,
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int32(len(parts)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int64(cap),
            )
            if n <= cap:
                break
            cap = int(n)
        pairs = out[: 2 * n].reshape(-1, 2).astype(np.int64)
        combo = pairs[:, 0] * (self._n + 1) + pairs[:, 1]
        uniq, counts = np.unique(combo, return_counts=True)
        return uniq // (self._n + 1), uniq % (self._n + 1), counts

    def scan_batch_flat(self, token_lists):
        """[(tokens)] -> (page_idx int64 array, pattern keys per hit, counts)
        over UNIQUE (page, pattern) pairs — the flat shape the Arrow batch
        emitters want. One C call for the whole batch; occurrence pairs are
        aggregated with np.unique (C-speed)."""
        np = self._np
        if self._n == 0 or not token_lists:
            return np.zeros(0, dtype=np.int64), [], np.zeros(0, dtype=np.int64)
        parts = [(" " + " ".join(t) + " ").encode("utf-8") if t else b"" for t in token_lists]
        page_idx, pat_idx, counts = self._scan_concat(parts, self._lib.ac_scan_multi)
        keys = [self._keys[i] for i in pat_idx]
        return page_idx, keys, counts

    def scan_batch_hits_text(self, texts):
        """[foldable text bytes per page] -> unique (page_idx, pat_idx,
        counts). The C pass case-folds and tokenizes (ac_scan_multi_fold)
        — no Python lower/findall/join per page; feed it
        textnorm.foldable_text_py / foldable_text_from_html_py output."""
        np = self._np
        if self._n == 0 or not texts:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return self._scan_concat(texts, self._lib.ac_scan_multi_fold)

    def expand_hits(self, page_idx, pat_idx, counts):
        """Vectorized (uri, surface) fan-out of unique (page, pattern) hits:
        returns (page_sel int64, uris pa.Array, surfaces pa.Array, n_hits
        int64) with one row per (page, uri, surface) — no per-hit Python.
        Patterns with multiple keys (same phrase, several uris) repeat."""
        import pyarrow as pa

        np = self._np
        if self._flat_uris is None:
            self._key_counts = np.array(
                [len(ks) for ks in self._keys], dtype=np.int64
            )
            self._key_offs = np.concatenate(
                ([0], np.cumsum(self._key_counts))
            )
            self._flat_uris = pa.array(
                [u for ks in self._keys for (u, _p) in ks], type=pa.string()
            )
            self._flat_phrases = pa.array(
                [p for ks in self._keys for (_u, p) in ks], type=pa.string()
            )
        rep = self._key_counts[pat_idx]
        total = int(rep.sum())
        page_sel = np.repeat(page_idx, rep)
        n_hits = np.repeat(counts, rep)
        grp_start = np.repeat(np.cumsum(rep) - rep, rep)
        within = np.arange(total, dtype=np.int64) - grp_start
        idx = pa.array(np.repeat(self._key_offs[pat_idx], rep) + within)
        return page_sel, self._flat_uris.take(idx), self._flat_phrases.take(idx), n_hits

    def __del__(self):
        try:
            if getattr(self, "_ac", None) and getattr(self, "_lib", None):
                self._lib.ac_free(self._ac)
        except Exception:
            pass
