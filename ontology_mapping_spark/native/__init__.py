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
        multi_argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.ac_scan_multi_agg.restype = ctypes.c_int64
        lib.ac_scan_multi_agg.argtypes = multi_argtypes
        lib.ac_scan_multi_fold_agg.restype = ctypes.c_int64
        lib.ac_scan_multi_fold_agg.argtypes = multi_argtypes
        lib.ent_build.restype = ctypes.c_void_p
        lib.ent_build.argtypes = [
            ctypes.c_char_p,                      # names buf
            ctypes.POINTER(ctypes.c_int64),       # name offs
            ctypes.c_char_p,                      # repls buf
            ctypes.POINTER(ctypes.c_int64),       # repl offs
            ctypes.c_char_p,                      # eflags
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),       # charref nums (sorted)
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),       # invalid cps (sorted)
            ctypes.c_int32,
        ]
        lib.ent_free.restype = None
        lib.ent_free.argtypes = [ctypes.c_void_p]
        lib.ac_scan_multi_html_agg.restype = ctypes.c_int64
        lib.ac_scan_multi_html_agg.argtypes = [
            ctypes.c_void_p,                      # AC
            ctypes.c_void_p,                      # EntTable
            ctypes.c_void_p,                      # html buf (bytes or address)
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),       # out triples
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),       # per-page flags
        ]
        lib.ac_scan_sentences.restype = ctypes.c_int32
        lib.ac_scan_sentences.argtypes = [
            ctypes.c_void_p,                      # AC
            ctypes.c_void_p,                      # text buf (bytes or address)
            ctypes.POINTER(ctypes.c_int64),       # text offs
            ctypes.c_int32,                       # n_texts
            ctypes.POINTER(ctypes.c_int64),       # pattern offs (lengths)
            ctypes.c_int32,                       # pre_split
            ctypes.POINTER(ctypes.c_int32),       # sent_out
            ctypes.c_int64,                       # sent_cap
            ctypes.POINTER(ctypes.c_uint8),       # fold_out
            ctypes.c_int64,                       # fold_cap
            ctypes.POINTER(ctypes.c_int64),       # fold_offs
            ctypes.POINTER(ctypes.c_int32),       # hit_out
            ctypes.c_int64,                       # hit_cap
            ctypes.POINTER(ctypes.c_int64),       # counts[3]
            ctypes.POINTER(ctypes.c_uint8),       # per-page flags
        ]
        lib.extract_fold_debug.restype = ctypes.c_int64
        lib.extract_fold_debug.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


_ENT = None
_ENT_TRIED = False


def load_entity_table():
    """Process-lifetime EntTable handle for the C HTML path, or None.

    Built from THIS interpreter's ``html`` module tables (html5 named
    entities, _invalid_charrefs, _invalid_codepoints), so the C decoder
    can never drift from the Python ``html.unescape`` the golden tests
    pin — the replacement for each entity is precomputed as its FOLD
    EFFECT: bytes in [a-z0-9] emit into the token stream, 0x20 is a
    separator, and entities whose value str.lower()s into ASCII alnums
    from a non-ASCII char (exactly ``Idot;`` -> U+0130) carry a flag
    that routes the page to the Python path."""
    global _ENT, _ENT_TRIED
    if _ENT_TRIED:
        return _ENT
    _ENT_TRIED = True
    lib = load_acscan()
    if lib is None:
        return None
    # Same contract as load_acscan: ANY failure (a stdlib table rename, a
    # charref-contract violation) degrades to the Python path instead of
    # crashing executor tasks — but loudly, via a warning.
    try:
        _ENT = _build_entity_table(lib)
    except Exception as exc:  # noqa: BLE001 - degradation seam by design
        import warnings

        warnings.warn(
            f"native entity table unavailable, using Python HTML path: {exc}",
            RuntimeWarning,
            stacklevel=2,
        )
        _ENT = None
    return _ENT


def _build_entity_table(lib):
    import html as _html
    from html.entities import html5

    import numpy as np

    names, repls, eflags = [], [], []
    for key, val in html5.items():
        fold = bytearray()
        fl = 0
        for ch in val:
            o = ord(ch)
            if 0x61 <= o <= 0x7A or 0x30 <= o <= 0x39:
                fold.append(o)
            elif 0x41 <= o <= 0x5A:
                fold.append(o + 32)
            elif o in (0x130, 0x212A):
                fl = 1
            else:
                fold.append(0x20)
        names.append(key.encode("ascii"))
        repls.append(bytes(fold))
        eflags.append(fl)
    nbuf = b"".join(names)
    rbuf = b"".join(repls)
    noffs = np.zeros(len(names) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in names], out=noffs[1:])
    roffs = np.zeros(len(repls) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in repls], out=roffs[1:])
    charrefs = np.array(sorted(_html._invalid_charrefs), dtype=np.int32)
    invalid = np.array(sorted(_html._invalid_codepoints), dtype=np.int32)
    # contract check: every charref value must fold to pure separators
    # (the C table only records membership) — true for the whole
    # windows-1252 map; RuntimeError (not assert: survives python -O) so a
    # stdlib change can't silently skew — the caller degrades to Python.
    for v in _html._invalid_charrefs.values():
        if any(
            (c.isascii() and c.isalnum())
            or (ord(c) >= 128 and any(x.isascii() and x.isalnum() for x in c.lower()))
            for c in v
        ):
            raise RuntimeError(
                "charref value no longer separator-only; regenerate C tables"
            )
    handle = lib.ent_build(
        nbuf,
        noffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rbuf,
        roffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bytes(eflags),
        ctypes.c_int32(len(names)),
        charrefs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(len(charrefs)),
        invalid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(len(invalid)),
    )
    return ctypes.c_void_p(handle) if handle else None


def extract_fold_debug(html: bytes) -> tuple[bytes | None, bool]:
    """(folded token stream, flagged) via the C extractor — the
    equivalence-test window onto the exact bytes the scan consumes.
    Returns (None, True) when the page is flagged for the Python path."""
    lib = load_acscan()
    ent = load_entity_table()
    if lib is None or ent is None:
        raise RuntimeError("native extractor unavailable")
    out = ctypes.create_string_buffer(max(len(html), 1))
    flagged = ctypes.c_int32(0)
    n = lib.extract_fold_debug(
        ent, html, ctypes.c_int64(len(html)), out, ctypes.byref(flagged)
    )
    if flagged.value:
        return None, True
    return out.raw[: int(n)], False


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
        self._offs = offs  # pattern byte offsets: lengths for ac_scan_sentences
        self._np = np
        self._ac = lib.ac_build(
            buf,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int32(self._n),
        )
        if not self._ac:
            raise RuntimeError("ac_build failed")
        self._counts = np.zeros(max(self._n, 1), dtype=np.int32)
        # adaptive output-capacity estimate (unique pairs per page): the
        # C batch calls size their buffer from the LAST batch's observed
        # rate x1.5 headroom — a fixed low guess made every batch overflow
        # and re-scan (a measured full 2x on the bench corpus, which hits
        # ~10 unique pairs/page against the old 4/page guess)
        self._rate = 16.0
        # adaptive per-page estimates for the sentence-scoped scan
        self._sent_rate = 8.0   # hit-bearing sentences / page
        self._hit_rate = 16.0   # first-occurrence hits / page
        self._fold_rate = 512.0  # padded folded bytes / page
        # lazy flat key arrays for expand_hits (built on first use)
        self._flat_uris = None
        self._flat_phrases = None
        self._flat_mlen = None
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

    def _scan_concat(self, parts, fn, update_rate=True):
        """One C call (``fn``, an *_agg entry point) over concatenated
        per-page byte buffers; returns unique (page_idx, pat_idx, counts)
        int64 arrays. Aggregation over occurrences happens IN the C pass
        (per-pattern stamp array — see acscan.c emit_pair), replacing the
        former np.unique sort over raw occurrence pairs; the capacity
        guess is adaptive so a typical batch never overflow-rescans.
        ``update_rate=False`` for unrepresentative inputs (the flagged-page
        fallback scans a tiny subset whose density would clobber the
        estimate for the NEXT full batch — re-creating the double-scan)."""
        np = self._np
        offs = np.zeros(len(parts) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in parts], out=offs[1:])
        buf = b"".join(parts)
        n_pages = len(parts)
        cap = max(int(self._rate * n_pages) + 64, 4096)
        while True:
            out = np.empty(3 * cap, dtype=np.int32)
            n = fn(
                self._ac,
                buf,
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int32(n_pages),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int64(cap),
            )
            if n < 0:
                raise MemoryError("native scan scratch allocation failed")
            if n <= cap:
                break
            cap = int(n)
        if n_pages and update_rate:
            self._rate = n / n_pages * 1.5 + 1.0
        tri = out[: 3 * n].reshape(-1, 3)
        return (
            tri[:, 0].astype(np.int64),
            tri[:, 1].astype(np.int64),
            tri[:, 2].astype(np.int64),
        )

    def scan_batch_flat(self, token_lists):
        """[(tokens)] -> (page_idx int64 array, pattern keys per hit, counts)
        over UNIQUE (page, pattern) pairs — the flat shape the Arrow batch
        emitters want. One C call for the whole batch; occurrence pairs are
        aggregated inside the C pass (per-pattern stamp array)."""
        np = self._np
        if self._n == 0 or not token_lists:
            return np.zeros(0, dtype=np.int64), [], np.zeros(0, dtype=np.int64)
        parts = [(" " + " ".join(t) + " ").encode("utf-8") if t else b"" for t in token_lists]
        page_idx, pat_idx, counts = self._scan_concat(parts, self._lib.ac_scan_multi_agg)
        keys = [self._keys[i] for i in pat_idx]
        return page_idx, keys, counts

    def scan_batch_hits_text(self, texts):
        """[foldable text bytes per page] -> unique (page_idx, pat_idx,
        counts). The C pass case-folds and tokenizes (ac_scan_multi_fold_agg)
        — no Python lower/findall/join per page; feed it
        textnorm.foldable_text_py / foldable_text_from_html_py output."""
        np = self._np
        if self._n == 0 or not texts:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return self._scan_concat(texts, self._lib.ac_scan_multi_fold_agg)

    def _scan_html_raw(self, buf_arg, offs, n_pages):
        """One ``ac_scan_multi_html_agg`` call (retry on cap overflow,
        adaptive capacity): returns unique (page_idx, pat_idx, counts)
        int64 arrays plus flags uint8[n_pages]."""
        np = self._np
        ent = load_entity_table()
        flags = np.zeros(n_pages, dtype=np.uint8)
        cap = max(int(self._rate * n_pages) + 64, 4096)
        while True:
            out = np.empty(3 * cap, dtype=np.int32)
            flags[:] = 0
            n = self._lib.ac_scan_multi_html_agg(
                self._ac,
                ent,
                buf_arg,
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int32(n_pages),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int64(cap),
                flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if n < 0:
                raise MemoryError("ac_scan_multi_html scratch allocation failed")
            if n <= cap:
                break
            cap = int(n)
        if n_pages:
            self._rate = n / n_pages * 1.5 + 1.0
        tri = out[: 3 * n].reshape(-1, 3)
        return (
            tri[:, 0].astype(np.int64),
            tri[:, 1].astype(np.int64),
            tri[:, 2].astype(np.int64),
            flags,
        )

    def supports_html(self) -> bool:
        return load_entity_table() is not None

    def scan_batch_hits_html(self, htmls):
        """[raw html bytes per page] OR a pyarrow binary/string Array ->
        unique (page_idx, pat_idx, counts). The WHOLE per-page path —
        comment strip, boilerplate strip, tag strip, entity decode,
        case-fold, tokenize, match — is one C call per batch; with an
        Arrow array the page bytes are consumed zero-copy from the Arrow
        data buffer (no to_pylist, no join). Pages the C extractor flags
        as ambiguous (non-ASCII near a boiler name, U+0130/U+212A,
        ``&Idot;`` — see acscan.c) are re-run through the Python
        extraction path (textnorm.foldable_text_from_html_py) in a second
        small C call, so results are exactly the Python pipeline's."""
        np = self._np
        n_pages = len(htmls)
        if self._n == 0 or n_pages == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        # arr/items own the bytes behind buf_arg — keep both in scope
        # through the C call and the flagged re-scan below
        buf_arg, offs, n_pages, arr, items = self._flat_bytes_input(htmls)
        page_idx, pat_idx, counts, flags = self._scan_html_raw(
            buf_arg, offs, n_pages
        )
        flagged = np.nonzero(flags)[0]
        if flagged.size:
            from ontology_mapping_spark.textnorm import foldable_text_from_html_py

            if arr is not None:
                get = lambda i: arr[int(i)].as_py()  # noqa: E731
            else:
                get = lambda i: items[int(i)]  # noqa: E731
            texts = [foldable_text_from_html_py(get(i)) for i in flagged]
            p2, pat2, cnt2 = self._scan_concat(
                texts, self._lib.ac_scan_multi_fold_agg, update_rate=False
            )
            page_idx = np.concatenate([page_idx, flagged[p2]])
            pat_idx = np.concatenate([pat_idx, pat2])
            counts = np.concatenate([counts, cnt2])
        return page_idx, pat_idx, counts

    def _ensure_flat(self):
        """Lazy flat key arrays shared by the fan-out expanders."""
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
            # phrase length per flat key — folded text is pure ASCII, so
            # the matched phrase is too and bytes == chars == F.length
            self._flat_mlen = np.array(
                [len(p) for ks in self._keys for (_u, p) in ks],
                dtype=np.int32,
            )

    def expand_hits(self, page_idx, pat_idx, counts):
        """Vectorized (uri, surface) fan-out of unique (page, pattern) hits:
        returns (page_sel int64, uris pa.Array, surfaces pa.Array, n_hits
        int64) with one row per (page, uri, surface) — no per-hit Python.
        Patterns with multiple keys (same phrase, several uris) repeat."""
        import pyarrow as pa

        np = self._np
        self._ensure_flat()
        rep = self._key_counts[pat_idx]
        total = int(rep.sum())
        page_sel = np.repeat(page_idx, rep)
        n_hits = np.repeat(counts, rep)
        grp_start = np.repeat(np.cumsum(rep) - rep, rep)
        within = np.arange(total, dtype=np.int64) - grp_start
        idx = pa.array(np.repeat(self._key_offs[pat_idx], rep) + within)
        return page_sel, self._flat_uris.take(idx), self._flat_phrases.take(idx), n_hits

    def _flat_bytes_input(self, texts):
        """(buf_arg, offs int64, n, arr, items) for list[bytes] OR a
        pyarrow binary/string Array — Arrow data is consumed zero-copy
        from its buffers. Exactly one of ``arr`` (the possibly freshly
        combined pa.Array) / ``items`` (a normalized bytes list) is
        non-None and OWNS the memory ``buf_arg`` points into: callers
        MUST hold the full returned tuple alive for the duration of the
        C call (a bare address from a combined ChunkedArray would
        otherwise be freed at return)."""
        np = self._np
        n = len(texts)
        arr = None
        if not isinstance(texts, (list, tuple)):
            import pyarrow as pa

            arr = texts
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if arr.null_count or arr.buffers()[2] is None:
                texts = [t if t is not None else b"" for t in arr.to_pylist()]
                texts = [t.encode("utf-8") if isinstance(t, str) else t for t in texts]
                arr = None
        if arr is not None:
            import pyarrow as pa

            bufs = arr.buffers()
            if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
                offs = np.frombuffer(
                    bufs[1], dtype=np.int64, count=n + 1, offset=arr.offset * 8
                ).copy()
            else:
                offs = np.frombuffer(
                    bufs[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4
                ).astype(np.int64)
            return ctypes.c_void_p(bufs[2].address), offs, n, arr, None
        parts = [t if t is not None else b"" for t in texts]
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(p) for p in parts], out=offs[1:])
        return b"".join(parts), offs, n, None, parts

    def scan_sentences(self, texts, pre_split=False):
        """Sentence-scoped scan (ac_scan_sentences): per sentence with >= 1
        vocabulary hit, its padded folded text plus first-occurrence hits.

        ``texts``: list of raw page-text bytes, or a pyarrow string/binary
        Array consumed zero-copy. Returns (page_idx int64[ns], sent_id
        int32[ns], nh int32[ns], padded pa.StringArray[ns], pat_idx
        int64[nhits], pos int32[nhits], flags uint8[n_pages]); the hits of
        sentence k occupy the contiguous slice sum(nh[:k]) .. +nh[k].
        Pages with flags[t] = 1 hit an exotic-lower code point and emitted
        nothing — re-run them with ``pre_split=True``, where each input is
        ONE already-padded folded sentence (page_idx = input index,
        sent_id = 0, flags unused)."""
        import pyarrow as pa

        np = self._np
        n = len(texts)
        empty = (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int32),
            np.zeros(0, dtype=np.int32),
            pa.array([], type=pa.string()),
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int32),
            np.zeros(max(n, 1), dtype=np.uint8)[:n],
        )
        if self._n == 0 or n == 0:
            return empty
        # _keep owns the bytes behind buf_arg (combined ChunkedArray or
        # normalized list) — it must outlive every ac_scan_sentences call
        buf_arg, offs, n, _keep_arr, _keep_items = self._flat_bytes_input(texts)
        sent_cap = max(int(self._sent_rate * n) + 64, 1024)
        hit_cap = max(int(self._hit_rate * n) + 64, 1024)
        fold_cap = max(int(self._fold_rate * n) + 1024, 1 << 16)
        flags = np.zeros(n, dtype=np.uint8)
        while True:
            sent_out = np.empty(3 * sent_cap, dtype=np.int32)
            fold_out = np.empty(fold_cap, dtype=np.uint8)
            fold_offs = np.zeros(sent_cap + 1, dtype=np.int64)
            hit_out = np.empty(2 * hit_cap, dtype=np.int32)
            counts = np.zeros(3, dtype=np.int64)
            flags[:] = 0
            rc = self._lib.ac_scan_sentences(
                self._ac,
                buf_arg,
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int32(n),
                self._offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int32(1 if pre_split else 0),
                sent_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int64(sent_cap),
                fold_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int64(fold_cap),
                fold_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                hit_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int64(hit_cap),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc < 0:
                raise MemoryError("ac_scan_sentences scratch allocation failed")
            ns, nh, nf = (int(x) for x in counts)
            if ns <= sent_cap and nh <= hit_cap and nf <= fold_cap:
                break
            sent_cap = max(sent_cap, ns)
            hit_cap = max(hit_cap, nh)
            fold_cap = max(fold_cap, nf)
        if n and not pre_split:
            self._sent_rate = ns / n * 1.5 + 1.0
            self._hit_rate = nh / n * 1.5 + 1.0
            self._fold_rate = nf / n * 1.5 + 64.0
        tri = sent_out[: 3 * ns].reshape(-1, 3)
        padded = pa.Array.from_buffers(
            pa.large_utf8(),
            ns,
            [None, pa.py_buffer(fold_offs[: ns + 1].tobytes()),
             pa.py_buffer(fold_out[:nf].tobytes())],
        ).cast(pa.string())
        hits = hit_out[: 2 * nh].reshape(-1, 2)
        return (
            tri[:, 0].astype(np.int64),
            tri[:, 1].copy(),
            tri[:, 2].copy(),
            padded,
            hits[:, 0].astype(np.int64),
            hits[:, 1].copy(),
            flags,
        )

    def expand_sentence_hits(self, nh, pat_idx, pos):
        """(per-sentence hit counts, flat pat_idx, flat pos) -> ``ms``
        pa.ListArray<struct<pos int32, mlen int32, uri string>> with one
        list per sentence — each (pattern, pos) hit fans out to every
        (uri, phrase) key sharing that pattern, vectorized (no per-hit
        Python), mirroring :meth:`expand_hits`."""
        import pyarrow as pa

        np = self._np
        self._ensure_flat()
        rep = self._key_counts[pat_idx]
        total = int(rep.sum())
        grp_start = np.repeat(np.cumsum(rep) - rep, rep)
        within = np.arange(total, dtype=np.int64) - grp_start
        idx = np.repeat(self._key_offs[pat_idx], rep) + within
        values = pa.StructArray.from_arrays(
            [
                pa.array(np.repeat(pos.astype(np.int32), rep), type=pa.int32()),
                pa.array(self._flat_mlen[idx], type=pa.int32()),
                self._flat_uris.take(pa.array(idx)),
            ],
            names=["pos", "mlen", "uri"],
        )
        # list offsets: fanned hit count per sentence (hits are contiguous)
        rep_cum = np.concatenate(([0], np.cumsum(rep))).astype(np.int64)
        ends = np.concatenate(([0], np.cumsum(nh.astype(np.int64))))
        offsets = rep_cum[ends]
        return pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()), values
        )

    def __del__(self):
        try:
            if getattr(self, "_ac", None) and getattr(self, "_lib", None):
                self._lib.ac_free(self._ac)
        except Exception:
            pass
