/* Byte-level Aho-Corasick for the mention-scan hot loop.
 *
 * The pure-Python trie walker costs one dict lookup per token position;
 * at 100 TB the scan kernel is the pages pipeline's ceiling (BENCH.md).
 * This automaton runs the whole page in one C pass: sparse goto edges in
 * a single open-addressing hash table keyed by (node<<8)|byte, fail links
 * and output links computed by BFS. Patterns are the space-padded
 * normalized phrases (" phrase "), so matches are token-exact, and every
 * occurrence -- including boundary-sharing overlaps -- is reported via
 * the output-link chain (same per-start-position contract as the Python
 * kernels; equivalence-tested in tests/test_mentions.py).
 *
 * Deduplication contract: the caller passes each distinct padded phrase
 * once, so at most one pattern id ends at any node (out[node] is a single
 * id, not a list).
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    int64_t *keys;    /* (node<<8)|byte, -1 = empty */
    int32_t *vals;    /* child node id */
    int64_t  cap;     /* power of two */
    int64_t  mask;
    int32_t *fail;
    int32_t *olink;   /* nearest suffix node with a pattern, -1 none */
    int32_t *out;     /* pattern id ending exactly here, -1 none */
    int32_t  n_nodes;
    int32_t  n_patterns;
    /* dense fast paths for the two hottest states: the root (state 0,
     * where the scan sits between tokens) and s1 = goto(root, ' ') (the
     * token-boundary state every candidate match enters). All patterns
     * are space-padded, so root advances ONLY on ' ' — the scan memchr()s
     * from root to the next space instead of hashing every byte. */
    int32_t  root_next[256];
    int32_t  s1;
    int32_t  s1_next[256];
} AC;

static inline int64_t h64(int64_t k) {
    uint64_t x = (uint64_t)k;
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return (int64_t)x;
}

static int32_t ht_get(const AC *ac, int32_t node, uint8_t c) {
    int64_t k = ((int64_t)node << 8) | c;
    int64_t i = h64(k) & ac->mask;
    while (ac->keys[i] != -1) {
        if (ac->keys[i] == k) return ac->vals[i];
        i = (i + 1) & ac->mask;
    }
    return -1;
}

static void ht_put(AC *ac, int32_t node, uint8_t c, int32_t child) {
    int64_t k = ((int64_t)node << 8) | c;
    int64_t i = h64(k) & ac->mask;
    while (ac->keys[i] != -1) {
        if (ac->keys[i] == k) { ac->vals[i] = child; return; }
        i = (i + 1) & ac->mask;
    }
    ac->keys[i] = k;
    ac->vals[i] = child;
}

void ac_free(AC *ac) {
    if (!ac) return;
    free(ac->keys); free(ac->vals); free(ac->fail);
    free(ac->olink); free(ac->out); free(ac);
}

/* buf: concatenated pattern bytes; offs[i]..offs[i+1] = pattern i. */
AC *ac_build(const uint8_t *buf, const int64_t *offs, int32_t n_patterns) {
    int64_t total = offs[n_patterns];
    int64_t max_nodes = total + 1;
    int64_t cap = 16;
    while (cap < 4 * (total + 16)) cap <<= 1;

    AC *ac = (AC *)calloc(1, sizeof(AC));
    if (!ac) return NULL;
    ac->cap = cap; ac->mask = cap - 1;
    ac->keys = (int64_t *)malloc(cap * sizeof(int64_t));
    ac->vals = (int32_t *)malloc(cap * sizeof(int32_t));
    ac->fail = (int32_t *)calloc(max_nodes, sizeof(int32_t));
    ac->olink = (int32_t *)malloc(max_nodes * sizeof(int32_t));
    ac->out = (int32_t *)malloc(max_nodes * sizeof(int32_t));
    if (!ac->keys || !ac->vals || !ac->fail || !ac->olink || !ac->out) {
        ac_free(ac); return NULL;
    }
    memset(ac->keys, 0xff, cap * sizeof(int64_t));            /* -1 */
    memset(ac->out, 0xff, max_nodes * sizeof(int32_t));       /* -1 */
    memset(ac->olink, 0xff, max_nodes * sizeof(int32_t));     /* -1 */
    ac->n_nodes = 1;
    ac->n_patterns = n_patterns;

    /* trie insert */
    for (int32_t p = 0; p < n_patterns; p++) {
        int32_t node = 0;
        for (int64_t i = offs[p]; i < offs[p + 1]; i++) {
            uint8_t c = buf[i];
            int32_t nxt = ht_get(ac, node, c);
            if (nxt < 0) {
                nxt = ac->n_nodes++;
                ht_put(ac, node, c, nxt);
            }
            node = nxt;
        }
        ac->out[node] = p;
    }

    /* BFS fail + output links. Edge list per node is implicit in the hash
     * table; walk it by scanning all slots once, bucketed by depth via a
     * queue of (node) with per-node child discovery through a second pass
     * structure: build child adjacency arrays first. */
    int32_t n = ac->n_nodes;
    int32_t *head = (int32_t *)malloc(n * sizeof(int32_t));
    int32_t *nexte = (int32_t *)malloc(cap * sizeof(int32_t));
    int32_t *echild = (int32_t *)malloc(cap * sizeof(int32_t));
    uint8_t *echar = (uint8_t *)malloc(cap * sizeof(uint8_t));
    int32_t *queue = (int32_t *)malloc(n * sizeof(int32_t));
    if (!head || !nexte || !echild || !echar || !queue) {
        free(head); free(nexte); free(echild); free(echar); free(queue);
        ac_free(ac); return NULL;
    }
    memset(head, 0xff, n * sizeof(int32_t));
    int32_t ne = 0;
    for (int64_t i = 0; i < cap; i++) {
        if (ac->keys[i] == -1) continue;
        int32_t parent = (int32_t)(ac->keys[i] >> 8);
        echild[ne] = ac->vals[i];
        echar[ne] = (uint8_t)(ac->keys[i] & 0xff);
        nexte[ne] = head[parent];
        head[parent] = ne++;
    }
    int32_t qh = 0, qt = 0;
    for (int32_t e = head[0]; e != -1; e = nexte[e]) {
        ac->fail[echild[e]] = 0;
        queue[qt++] = echild[e];
    }
    while (qh < qt) {
        int32_t u = queue[qh++];
        int32_t fu = ac->fail[u];
        ac->olink[u] = (ac->out[fu] >= 0) ? fu : ac->olink[fu];
        for (int32_t e = head[u]; e != -1; e = nexte[e]) {
            int32_t v = echild[e];
            uint8_t c = echar[e];
            int32_t f = fu;
            int32_t g;
            while ((g = ht_get(ac, f, c)) < 0 && f != 0) f = ac->fail[f];
            ac->fail[v] = (g >= 0 && g != v) ? g : 0;
            queue[qt++] = v;
        }
    }
    free(head); free(nexte); free(echild); free(echar); free(queue);
    for (int c = 0; c < 256; c++) ac->root_next[c] = 0;
    for (int64_t i = 0; i < cap; i++) {
        if (ac->keys[i] != -1 && (ac->keys[i] >> 8) == 0)
            ac->root_next[ac->keys[i] & 0xff] = ac->vals[i];
    }
    ac->s1 = ac->root_next[(uint8_t)' '];
    for (int c = 0; c < 256; c++) ac->s1_next[c] = -1;
    if (ac->s1 > 0) {
        for (int64_t i = 0; i < cap; i++) {
            if (ac->keys[i] != -1 && (ac->keys[i] >> 8) == ac->s1)
                ac->s1_next[ac->keys[i] & 0xff] = ac->vals[i];
        }
    }
    return ac;
}

/* ---- occurrence emitter: folds occurrences into (text, pattern, count)
 * int32 triples AS THEY ARE EMITTED via a per-pattern stamp array —
 * pages are scanned in increasing t, so stamp[pat] == t+1 identifies
 * "this pattern already has a triple for the current page" in O(1), no
 * sort, no hash. This replaces the caller-side np.unique over ~10 raw
 * pairs/page (a measured ~6% of the single-thread scan cost at bench
 * shape, growing with hit density). `n` counts TOTAL unique pairs;
 * entries beyond cap are not written and the caller re-calls with a
 * larger buffer. */
typedef struct {
    int32_t *out;
    int64_t  cap, n;
    int32_t *stamp;   /* n_patterns; t+1 of the page last seen, 0 = never */
    int64_t *slot;    /* n_patterns; out-index of that page's triple */
} Emit;

static inline void emit_pair(Emit *em, int32_t t, int32_t pat) {
    if (em->stamp[pat] == t + 1) {
        int64_t s = em->slot[pat];
        if (s < em->cap) em->out[3 * s + 2]++;
        return;
    }
    em->stamp[pat] = t + 1;
    em->slot[pat] = em->n;
    if (em->n < em->cap) {
        em->out[3 * em->n] = t;
        em->out[3 * em->n + 1] = pat;
        em->out[3 * em->n + 2] = 1;
    }
    em->n++;
}

/* counts: caller-zeroed int32[n_patterns]; += occurrences per pattern. */
void ac_scan(const AC *ac, const uint8_t *text, int64_t len, int32_t *counts) {
    int32_t state = 0;
    for (int64_t i = 0; i < len; i++) {
        uint8_t c = text[i];
        int32_t g;
        while ((g = ht_get(ac, state, c)) < 0 && state != 0)
            state = ac->fail[state];
        state = (g >= 0) ? g : 0;
        int32_t t = state;
        if (ac->out[t] >= 0) counts[ac->out[t]]++;
        t = ac->olink[t];
        while (t >= 0) {
            counts[ac->out[t]]++;
            t = ac->olink[t];
        }
    }
}

/* Batch scan: texts concatenated in buf, text i = buf[t_offs[i]..t_offs[i+1]].
 * Every OCCURRENCE feeds the Emit aggregator (triples protocol above);
 * automaton state resets per text. One C call per Arrow batch amortizes
 * the Python->C transition over thousands of pages. */
static int64_t scan_multi_impl(const AC *ac, const uint8_t *buf,
                               const int64_t *t_offs, int32_t n_texts,
                               Emit *em) {
    for (int32_t t = 0; t < n_texts; t++) {
        int32_t state = 0;
        int64_t i = t_offs[t];
        const int64_t end = t_offs[t + 1];
        while (i < end) {
            if (state == 0) {
                /* root advances only on ' ' (patterns are space-padded):
                 * vectorized skip to the next token boundary */
                const uint8_t *p =
                    (const uint8_t *)memchr(buf + i, ' ', (size_t)(end - i));
                if (!p) break;
                i = (p - buf) + 1;
                state = ac->s1;
                /* s1 is " " alone — shorter than any pattern, no output */
                continue;
            }
            uint8_t c = buf[i];
            int32_t g;
            for (;;) {
                g = (state == 0) ? (c == ' ' ? ac->s1 : 0)
                    : (state == ac->s1) ? ac->s1_next[c]
                                        : ht_get(ac, state, c);
                if (g > 0) { state = g; break; }
                if (state == 0) { state = 0; break; }
                state = ac->fail[state];
            }
            i++;
            if (g <= 0) continue;  /* back at root: memchr path resumes */
            int32_t u = state;
            if (ac->out[u] >= 0) emit_pair(em, t, ac->out[u]);
            u = ac->olink[u];
            while (u >= 0) {
                emit_pair(em, t, ac->out[u]);
                u = ac->olink[u];
            }
        }
    }
    return em->n;
}

/* out holds (text, pattern, count) int32 triples over UNIQUE
 * (text, pattern) pairs; returns the unique-pair count. */
int64_t ac_scan_multi_agg(const AC *ac, const uint8_t *buf,
                          const int64_t *t_offs, int32_t n_texts,
                          int32_t *out, int64_t cap) {
    int32_t np = ac->n_patterns > 0 ? ac->n_patterns : 1;
    int32_t *stamp = (int32_t *)calloc(np, sizeof(int32_t));
    int64_t *slot = (int64_t *)malloc(np * sizeof(int64_t));
    if (!stamp || !slot) { free(stamp); free(slot); return -1; }
    Emit em = {out, cap, 0, stamp, slot};
    int64_t n = scan_multi_impl(ac, buf, t_offs, n_texts, &em);
    free(stamp); free(slot);
    return n;
}

/* ------------------------------------------------------------------ */
/* Folded batch scan: raw (extracted) page text in, token-exact matches
 * out — the tokenizer leaves Python entirely.
 *
 * Folding happens inside the scan loop: 'A'-'Z' -> 'a'-'z', [a-z0-9]
 * kept, EVERY other byte (including all non-ASCII UTF-8 bytes, which are
 * always >= 0x80) is a token separator. Separator runs collapse to one
 * virtual ' ', and each text's token stream gets virtual leading/trailing
 * pads — i.e. this scans exactly " " + " ".join(tokens) + " " where
 * tokens are the [a-z0-9]+ runs of the byte-folded text. That equals the
 * Python tokenizer contract (textnorm._tokens_from_text) for fold-safe
 * text; the Python caller routes the two divergent code points (U+0130,
 * U+212A — see textnorm._EXOTIC_LOWER) through the tokenizer first.
 * Output triples protocol identical to ac_scan_multi_agg. */

static inline uint8_t fold_byte(uint8_t c) {
    if (c >= 'a' && c <= 'z') return c;
    if (c >= 'A' && c <= 'Z') return (uint8_t)(c + 32);
    if (c >= '0' && c <= '9') return c;
    return 0;
}

#define AC_FEED(ch)                                                        \
    do {                                                                   \
        uint8_t c_ = (ch);                                                 \
        int32_t g_;                                                        \
        for (;;) {                                                         \
            g_ = (state == 0)       ? (c_ == ' ' ? ac->s1 : 0)             \
                 : (state == ac->s1) ? ac->s1_next[c_]                     \
                                     : ht_get(ac, state, c_);              \
            if (g_ > 0) { state = g_; break; }                             \
            if (state == 0) break;                                         \
            state = ac->fail[state];                                       \
        }                                                                  \
        if (g_ > 0) {                                                      \
            int32_t u_ = state;                                            \
            if (ac->out[u_] >= 0) emit_pair(em, t, ac->out[u_]);           \
            u_ = ac->olink[u_];                                            \
            while (u_ >= 0) {                                              \
                emit_pair(em, t, ac->out[u_]);                             \
                u_ = ac->olink[u_];                                        \
            }                                                              \
        } else {                                                           \
            state = 0;                                                     \
        }                                                                  \
    } while (0)

static int64_t scan_multi_fold_impl(const AC *ac, const uint8_t *buf,
                                    const int64_t *t_offs, int32_t n_texts,
                                    Emit *em) {
    for (int32_t t = 0; t < n_texts; t++) {
        int32_t state = 0;
        int pending_sep = 1; /* virtual leading pad, emitted lazily */
        int emitted = 0;     /* any token byte fed yet */
        const int64_t end = t_offs[t + 1];
        for (int64_t i = t_offs[t]; i < end; i++) {
            uint8_t f = fold_byte(buf[i]);
            if (!f) {
                pending_sep = 1;
                continue;
            }
            if (state == 0 && !pending_sep) {
                /* at root mid-token: no pattern can start before the next
                 * boundary (patterns begin with ' ') — skip token bytes
                 * without touching the hash table */
                while (i + 1 < end && fold_byte(buf[i + 1])) i++;
                continue;
            }
            if (pending_sep) {
                AC_FEED(' ');
                pending_sep = 0;
            }
            AC_FEED(f);
            emitted = 1;
        }
        if (emitted) AC_FEED(' '); /* trailing pad */
    }
    return em->n;
}

#undef AC_FEED

int64_t ac_scan_multi_fold_agg(const AC *ac, const uint8_t *buf,
                               const int64_t *t_offs, int32_t n_texts,
                               int32_t *out, int64_t cap) {
    int32_t np = ac->n_patterns > 0 ? ac->n_patterns : 1;
    int32_t *stamp = (int32_t *)calloc(np, sizeof(int32_t));
    int64_t *slot = (int64_t *)malloc(np * sizeof(int64_t));
    if (!stamp || !slot) { free(stamp); free(slot); return -1; }
    Emit em = {out, cap, 0, stamp, slot};
    int64_t n = scan_multi_fold_impl(ac, buf, t_offs, n_texts, &em);
    free(stamp); free(slot);
    return n;
}

/* ================================================================== */
/* HTML extraction in C: the full per-page path — comment strip,
 * boilerplate-container strip, tag strip, entity decode, case-fold,
 * tokenize, match — with zero per-page Python.
 *
 * Token-stream contract (NOT byte-stream): the output fed to the
 * automaton must equal " " + " ".join(tokens_from_html_py(html)) + " "
 * (textnorm.py) — i.e. the [a-z0-9]+ runs of the lowered text of
 * comment-stripped, boiler-stripped, tag-stripped, html.unescape()d
 * input. Because only alnum runs survive, every construct that merely
 * chooses WHICH separator to emit is free; the hard parts are (a) which
 * spans are visible text at all and (b) entity decodes that emit alnums
 * (&#65; -> 'a', &fjlig; -> "fj") or join neighbors (&#1; -> '').
 *
 * Anything whose Python semantics cannot be decided byte-wise flags the
 * page (flags[t] = 1, its pairs are rewound) and the caller re-runs just
 * that page through the Python path:
 *   - a non-ASCII byte inside a boiler-name window while the ASCII
 *     prefix so far could still extend to a boiler name (re.IGNORECASE
 *     has exotic pairs like U+017F~'s'; \b depends on unicode word
 *     chars; \s includes U+0085/U+00A0/...),
 *   - U+0130 / U+212A in visible text (str.lower() introduces ASCII
 *     alnums — same two code points textnorm._EXOTIC_LOWER routes),
 *   - an entity decoding to one of those (&Idot; or numeric).
 *
 * Python-pass replication notes (html.unescape, CPython html/__init__.py):
 *   - comments first (<!--.*?-->, unterminated -> literal), then boiler
 *     containers (<(script|...)\b[^>]*>.*?</\1\s*>, nearest closer,
 *     no-closer -> no match), then tags (<[^>]+>), then entities.
 *   - the boiler pass is GLOBAL — an opener inside another tag's
 *     attribute region still matches (verified fixture: pass 2 runs on
 *     the comment-stripped bytes before any tag logic).
 *   - named entity: candidate [^\t\n\f <&#;]{1,32};? then longest-prefix
 *     against html5 (keys with and without ';'); miss -> '&'+s literal.
 *   - numeric: charref map (windows-1252, all fold to separators) ->
 *     surrogate/overflow FFFD -> invalid-codepoint set '' (EMITS
 *     NOTHING, joins neighbors) -> chr(num).
 */

typedef struct {
    /* open-addressing entity hash: key bytes (may end with ';') */
    int64_t *slots;       /* index into entry arrays + 1, 0 = empty */
    int64_t  cap, mask;
    uint8_t *names;       /* concatenated key bytes */
    int64_t *name_offs;   /* n+1 */
    uint8_t *repls;       /* concatenated folded replacements */
    int64_t *repl_offs;   /* n+1 */
    uint8_t *eflags;      /* 1 = decoding flags the page (Idot;) */
    int32_t  n;
    int32_t *charref_nums;   /* sorted, values all fold to separator */
    int32_t  n_charref;
    int32_t *invalid_cp;     /* sorted, replacement is '' */
    int32_t  n_invalid;
} EntTable;

static uint64_t fnv1a(const uint8_t *s, int64_t n) {
    uint64_t h = 1469598103934665603ULL;
    for (int64_t i = 0; i < n; i++) { h ^= s[i]; h *= 1099511628211ULL; }
    return h;
}

void ent_free(EntTable *et) {
    if (!et) return;
    free(et->slots); free(et->names); free(et->name_offs);
    free(et->repls); free(et->repl_offs); free(et->eflags);
    free(et->charref_nums); free(et->invalid_cp); free(et);
}

EntTable *ent_build(const uint8_t *names, const int64_t *name_offs,
                    const uint8_t *repls, const int64_t *repl_offs,
                    const uint8_t *eflags, int32_t n,
                    const int32_t *charref_nums, int32_t n_charref,
                    const int32_t *invalid_cp, int32_t n_invalid) {
    EntTable *et = (EntTable *)calloc(1, sizeof(EntTable));
    if (!et) return NULL;
    int64_t cap = 16;
    while (cap < 4 * (int64_t)(n + 1)) cap <<= 1;
    et->cap = cap; et->mask = cap - 1;
    et->slots = (int64_t *)calloc(cap, sizeof(int64_t));
    int64_t nb = name_offs[n], rb = repl_offs[n];
    et->names = (uint8_t *)malloc(nb ? nb : 1);
    et->name_offs = (int64_t *)malloc((n + 1) * sizeof(int64_t));
    et->repls = (uint8_t *)malloc(rb ? rb : 1);
    et->repl_offs = (int64_t *)malloc((n + 1) * sizeof(int64_t));
    et->eflags = (uint8_t *)malloc(n ? n : 1);
    et->charref_nums = (int32_t *)malloc((n_charref ? n_charref : 1) * sizeof(int32_t));
    et->invalid_cp = (int32_t *)malloc((n_invalid ? n_invalid : 1) * sizeof(int32_t));
    if (!et->slots || !et->names || !et->name_offs || !et->repls ||
        !et->repl_offs || !et->eflags || !et->charref_nums || !et->invalid_cp) {
        ent_free(et); return NULL;
    }
    memcpy(et->names, names, nb);
    memcpy(et->name_offs, name_offs, (n + 1) * sizeof(int64_t));
    memcpy(et->repls, repls, rb);
    memcpy(et->repl_offs, repl_offs, (n + 1) * sizeof(int64_t));
    memcpy(et->eflags, eflags, n);
    memcpy(et->charref_nums, charref_nums, n_charref * sizeof(int32_t));
    memcpy(et->invalid_cp, invalid_cp, n_invalid * sizeof(int32_t));
    et->n = n; et->n_charref = n_charref; et->n_invalid = n_invalid;
    for (int32_t e = 0; e < n; e++) {
        const uint8_t *k = et->names + et->name_offs[e];
        int64_t kl = et->name_offs[e + 1] - et->name_offs[e];
        int64_t i = fnv1a(k, kl) & et->mask;
        while (et->slots[i]) i = (i + 1) & et->mask;
        et->slots[i] = e + 1;
    }
    return et;
}

/* lookup name[0..nlen) + (semi ? ";" : "") -> entry idx or -1 */
static int32_t ent_lookup(const EntTable *et, const uint8_t *name,
                          int64_t nlen, int semi) {
    uint64_t h = fnv1a(name, nlen);
    if (semi) { h ^= (uint8_t)';'; h *= 1099511628211ULL; }
    int64_t want = nlen + (semi ? 1 : 0);
    int64_t i = h & et->mask;
    while (et->slots[i]) {
        int32_t e = (int32_t)(et->slots[i] - 1);
        const uint8_t *k = et->names + et->name_offs[e];
        int64_t kl = et->name_offs[e + 1] - et->name_offs[e];
        if (kl == want && !memcmp(k, name, nlen) &&
            (!semi || k[nlen] == ';'))
            return e;
        i = (i + 1) & et->mask;
    }
    return -1;
}

static int i32_member(const int32_t *a, int32_t n, int64_t v) {
    int32_t lo = 0, hi = n - 1;
    while (lo <= hi) {
        int32_t mid = (lo + hi) >> 1;
        if (a[mid] == v) return 1;
        if (a[mid] < v) lo = mid + 1; else hi = mid - 1;
    }
    return 0;
}

/* ---- fold sink: match mode feeds the automaton with virtual pads
 * (same contract as ac_scan_multi_fold); debug mode writes the joined
 * token stream for the equivalence tests. ---- */
typedef struct {
    const AC *ac;
    int32_t state, t;
    Emit *em;
    int pending_sep, emitted;
    uint8_t *dbg;          /* debug mode when non-NULL */
    int64_t dbg_n;
} Sink;

static inline void sink_feed(Sink *sk, uint8_t c_) {
    const AC *ac = sk->ac;
    int32_t state = sk->state, g_;
    for (;;) {
        g_ = (state == 0)       ? (c_ == ' ' ? ac->s1 : 0)
             : (state == ac->s1) ? ac->s1_next[c_]
                                 : ht_get(ac, state, c_);
        if (g_ > 0) { state = g_; break; }
        if (state == 0) break;
        state = ac->fail[state];
    }
    if (g_ > 0) {
        int32_t u_ = state;
        if (ac->out[u_] >= 0) emit_pair(sk->em, sk->t, ac->out[u_]);
        u_ = ac->olink[u_];
        while (u_ >= 0) {
            emit_pair(sk->em, sk->t, ac->out[u_]);
            u_ = ac->olink[u_];
        }
    } else {
        state = 0;
    }
    sk->state = state;
}

static inline void sink_alnum(Sink *sk, uint8_t c) {
    if (sk->dbg) {
        if (sk->pending_sep && sk->emitted) sk->dbg[sk->dbg_n++] = ' ';
        sk->pending_sep = 0;
        sk->dbg[sk->dbg_n++] = c;
        sk->emitted = 1;
        return;
    }
    if (sk->state == 0 && !sk->pending_sep) {
        /* at root mid-token: patterns start with ' ', nothing can begin
         * before the next boundary */
        sk->emitted = 1;
        return;
    }
    if (sk->pending_sep) { sink_feed(sk, ' '); sk->pending_sep = 0; }
    sink_feed(sk, c);
    sk->emitted = 1;
}

static inline void sink_sep(Sink *sk) { sk->pending_sep = 1; }

static inline void sink_finish(Sink *sk) {
    if (!sk->dbg && sk->emitted) sink_feed(sk, ' '); /* trailing pad */
}

/* ---- pass 1: <!--.*?--> -> ' ' (unterminated -> literal rest) ---- */
static int64_t strip_comments(const uint8_t *in, int64_t len, uint8_t *out) {
    int64_t o = 0, i = 0;
    while (i < len) {
        const uint8_t *p = in + i;
        const uint8_t *lt;
        int64_t pos = -1;
        while ((lt = memchr(p, '<', len - (p - in))) != NULL) {
            int64_t q = lt - in;
            if (q + 4 <= len && lt[1] == '!' && lt[2] == '-' && lt[3] == '-') {
                pos = q; break;
            }
            p = lt + 1;
        }
        if (pos < 0) break;
        /* nearest "-->" from pos+4 */
        const uint8_t *d = in + pos + 4;
        int64_t close = -1;
        while ((d = memchr(d, '-', len - (d - in))) != NULL) {
            int64_t q = d - in;
            if (q + 3 <= len) {
                if (d[1] == '-' && d[2] == '>') { close = q; break; }
            } else break;
            d++;
        }
        if (close < 0) break; /* unterminated: literal rest */
        memcpy(out + o, in + i, pos - i); o += pos - i;
        out[o++] = ' ';
        i = close + 3;
    }
    memcpy(out + o, in + i, len - i); o += len - i;
    return o;
}

/* ---- pass 2: boiler containers -> ' ' ---- */
static const char *const BOILER_NAMES[8] = {
    "script", "style", "nav", "header", "footer", "aside", "noscript", "title"
};
static const int BOILER_LEN[8] = {6, 5, 3, 6, 6, 5, 8, 5};

static int boiler_prefix_live(const uint8_t *low, int nl) {
    for (int k = 0; k < 8; k++)
        if (nl <= BOILER_LEN[k] && !memcmp(low, BOILER_NAMES[k], nl))
            return 1;
    return 0;
}

/* at s[pos]=='<': 0 = not a boiler open, k+1 = boiler k opens here,
 * -1 = flag (non-ASCII in a live name window: IGNORECASE/\b ambiguity) */
static int boiler_open_at(const uint8_t *s, int64_t len, int64_t pos) {
    uint8_t low[9];
    int nl = 0;
    int64_t j = pos + 1;
    while (j < len && nl < 9) {
        uint8_t c = s[j];
        if (c >= 'A' && c <= 'Z') c += 32;
        if (c >= 'a' && c <= 'z') { low[nl++] = c; j++; continue; }
        if (c >= 0x80) return boiler_prefix_live(low, nl) ? -1 : 0;
        break;
    }
    if (nl == 0 || nl > 8 || j >= len) return 0; /* 9+ letters: \b fails for
        every complete name; name+EOF: no '>' can follow -> no match */
    for (int k = 0; k < 8; k++) {
        if (nl == BOILER_LEN[k] && !memcmp(low, BOILER_NAMES[k], nl)) {
            uint8_t b = s[j]; /* ASCII non-letter here */
            if ((b >= '0' && b <= '9') || b == '_') return 0; /* \b fails */
            return k + 1;
        }
    }
    return 0;
}

static int is_ascii_space(uint8_t c) {
    return (c >= 0x09 && c <= 0x0D) || (c >= 0x1C && c <= 0x1F) || c == 0x20;
}

static int64_t strip_boiler(const uint8_t *s, int64_t len, uint8_t *out,
                            int *flag) {
    int64_t o = 0, i = 0, seg = 0;
    while (i < len) {
        const uint8_t *lt = memchr(s + i, '<', len - i);
        if (!lt) break;
        int64_t pos = lt - s;
        int r = boiler_open_at(s, len, pos);
        if (r < 0) { *flag = 1; return 0; }
        if (r == 0) { i = pos + 1; continue; }
        int k = r - 1;
        int nl = BOILER_LEN[k];
        const uint8_t *gt = memchr(s + pos + 1 + nl, '>', len - pos - 1 - nl);
        if (!gt) { i = pos + 1; continue; } /* [^>]*> can't complete */
        int64_t body = (gt - s) + 1;
        int64_t c = body, close_end = -1;
        while (c < len) {
            const uint8_t *l2 = memchr(s + c, '<', len - c);
            if (!l2) break;
            int64_t p2 = l2 - s;
            if (p2 + 1 >= len) break;
            if (s[p2 + 1] != '/') { c = p2 + 1; continue; }
            int64_t q = p2 + 2;
            int m = 0, dead = 0;
            while (q < len && m < nl) {
                uint8_t ch = s[q];
                if (ch >= 0x80) { *flag = 1; return 0; } /* live-prefix zone */
                if (ch >= 'A' && ch <= 'Z') ch += 32;
                if (ch != (uint8_t)BOILER_NAMES[k][m]) { dead = 1; break; }
                m++; q++;
            }
            if (dead || m < nl) { c = p2 + 1; continue; }
            while (q < len && is_ascii_space(s[q])) q++;
            if (q < len && s[q] >= 0x80) { *flag = 1; return 0; } /* \s ambiguity */
            if (q < len && s[q] == '>') { close_end = q + 1; break; }
            c = p2 + 1;
        }
        if (close_end < 0) { i = pos + 1; continue; } /* .*?</\1\s*> fails */
        memcpy(out + o, s + seg, pos - seg); o += pos - seg;
        out[o++] = ' ';
        seg = close_end;
        i = close_end;
    }
    memcpy(out + o, s + seg, len - seg); o += len - seg;
    return o;
}

/* ---- pass 3: tag strip + entity decode + fold into the sink ---- */
static void emit_numeric(const EntTable *et, int64_t num, Sink *sk, int *flag) {
    if (i32_member(et->charref_nums, et->n_charref, num)) { sink_sep(sk); return; }
    if ((num >= 0xD800 && num <= 0xDFFF) || num > 0x10FFFF) { sink_sep(sk); return; }
    if (i32_member(et->invalid_cp, et->n_invalid, num)) return; /* '' joins */
    if (num >= '0' && num <= '9') { sink_alnum(sk, (uint8_t)num); return; }
    if (num >= 'A' && num <= 'Z') { sink_alnum(sk, (uint8_t)(num + 32)); return; }
    if (num >= 'a' && num <= 'z') { sink_alnum(sk, (uint8_t)num); return; }
    if (num == 0x130 || num == 0x212A) { *flag = 1; return; }
    sink_sep(sk);
}

/* literal bytes (no entity re-scan: candidates can't contain '&') */
static void emit_text_plain(const uint8_t *s, int64_t i, int64_t end,
                            Sink *sk, int *flag) {
    while (i < end) {
        uint8_t c = s[i];
        if (c >= 'a' && c <= 'z') { sink_alnum(sk, c); i++; continue; }
        if (c >= 'A' && c <= 'Z') { sink_alnum(sk, (uint8_t)(c + 32)); i++; continue; }
        if (c >= '0' && c <= '9') { sink_alnum(sk, c); i++; continue; }
        if (c >= 0x80) {
            if (c == 0xC4 && i + 1 < end && s[i + 1] == 0xB0) { *flag = 1; return; }
            if (c == 0xE2 && i + 2 < end && s[i + 1] == 0x84 && s[i + 2] == 0xAA) {
                *flag = 1; return;
            }
        }
        sink_sep(sk); i++;
    }
}

static void emit_repl(const EntTable *et, int32_t e, Sink *sk, int *flag) {
    if (et->eflags[e]) { *flag = 1; return; }
    for (int64_t r = et->repl_offs[e]; r < et->repl_offs[e + 1]; r++) {
        uint8_t c = et->repls[r];
        if (c == ' ') sink_sep(sk); else sink_alnum(sk, c);
    }
}

static int ent_name_char(uint8_t c) {
    /* [^\t\n\f <&#;] — \v \r and all >=0x80 bytes ARE candidate chars */
    return !(c == 0x09 || c == 0x0A || c == 0x0C || c == ' ' ||
             c == '<' || c == '&' || c == '#' || c == ';');
}

static int64_t emit_entity(const EntTable *et, const uint8_t *s, int64_t i,
                           int64_t end, Sink *sk, int *flag) {
    int64_t j = i + 1;
    if (j >= end) { sink_sep(sk); return j; }
    if (s[j] == '#') {
        int64_t k = j + 1;
        int hex = 0;
        if (k + 1 < end && (s[k] == 'x' || s[k] == 'X') &&
            ((s[k + 1] >= '0' && s[k + 1] <= '9') ||
             (s[k + 1] >= 'a' && s[k + 1] <= 'f') ||
             (s[k + 1] >= 'A' && s[k + 1] <= 'F'))) {
            hex = 1; k++;
        }
        if (!hex && !(k < end && s[k] >= '0' && s[k] <= '9')) {
            /* no numeric alternative matches: '&' '#' literal */
            sink_sep(sk); sink_sep(sk);
            return j + 1;
        }
        int64_t num = 0;
        while (k < end) {
            uint8_t d = s[k]; int v;
            if (d >= '0' && d <= '9') v = d - '0';
            else if (hex && d >= 'a' && d <= 'f') v = d - 'a' + 10;
            else if (hex && d >= 'A' && d <= 'F') v = d - 'A' + 10;
            else break;
            num = num * (hex ? 16 : 10) + v;
            if (num > 0x110000) num = 0x110000; /* saturate: stays >0x10FFFF,
                collides with no table key */
            k++;
        }
        if (k < end && s[k] == ';') k++;
        emit_numeric(et, num, sk, flag);
        return k;
    }
    int64_t k = j;
    int nlen = 0;
    while (k < end && nlen < 32 && ent_name_char(s[k])) { nlen++; k++; }
    if (nlen == 0) { sink_sep(sk); return j; } /* '&' literal */
    int semi = (k < end && s[k] == ';');
    int64_t after = k + (semi ? 1 : 0);
    const uint8_t *name = s + j;
    int32_t e;
    if (semi && (e = ent_lookup(et, name, nlen, 1)) >= 0) {
        emit_repl(et, e, sk, flag);
        return after;
    }
    for (int x = nlen; x >= 2; x--) {
        if ((e = ent_lookup(et, name, x, 0)) >= 0) {
            emit_repl(et, e, sk, flag);
            if (*flag) return after;
            emit_text_plain(s, j + x, after, sk, flag); /* remainder literal */
            return after;
        }
    }
    sink_sep(sk); /* '&' literal */
    emit_text_plain(s, j, after, sk, flag);
    return after;
}

static void emit_text_range(const EntTable *et, const uint8_t *s, int64_t i,
                            int64_t end, Sink *sk, int *flag) {
    while (i < end && !*flag) {
        uint8_t c = s[i];
        if (c == '&') { i = emit_entity(et, s, i, end, sk, flag); continue; }
        if (c >= 'a' && c <= 'z') { sink_alnum(sk, c); i++; continue; }
        if (c >= 'A' && c <= 'Z') { sink_alnum(sk, (uint8_t)(c + 32)); i++; continue; }
        if (c >= '0' && c <= '9') { sink_alnum(sk, c); i++; continue; }
        if (c >= 0x80) {
            if (c == 0xC4 && i + 1 < end && s[i + 1] == 0xB0) { *flag = 1; return; }
            if (c == 0xE2 && i + 2 < end && s[i + 1] == 0x84 && s[i + 2] == 0xAA) {
                *flag = 1; return;
            }
        }
        sink_sep(sk); i++;
    }
}

static void pass3(const EntTable *et, const uint8_t *s, int64_t len,
                  Sink *sk, int *flag) {
    int64_t i = 0;
    while (i < len && !*flag) {
        if (s[i] == '<') {
            const uint8_t *gt = memchr(s + i + 1, '>', len - i - 1);
            if (!gt) { /* <[^>]+> can't match: rest is literal text */
                emit_text_range(et, s, i, len, sk, flag);
                return;
            }
            if (gt == s + i + 1) { /* "<>" stays literal; folds to seps */
                sink_sep(sk);
                i += 2;
                continue;
            }
            sink_sep(sk); /* tag -> ' ' */
            i = (gt - s) + 1;
            continue;
        }
        const uint8_t *lt = memchr(s + i, '<', len - i);
        int64_t end = lt ? (lt - s) : len;
        emit_text_range(et, s, i, end, sk, flag);
        i = end;
    }
}

/* Batch HTML scan: raw html pages concatenated in buf (same offsets
 * protocol as ac_scan_multi_agg). flags: caller-zeroed uint8[n_texts];
 * set to 1 when a page hits an ambiguous construct — its triples are
 * rewound and the caller must re-run that page through the Python path.
 * Returns total unique-pair count (caller re-calls with a larger out
 * when it exceeds cap). */
static int64_t scan_multi_html_impl(const AC *ac, const EntTable *et,
                                    const uint8_t *buf, const int64_t *t_offs,
                                    int32_t n_texts, Emit *em,
                                    uint8_t *flags) {
    int64_t maxlen = 0;
    for (int32_t t = 0; t < n_texts; t++) {
        int64_t l = t_offs[t + 1] - t_offs[t];
        if (l > maxlen) maxlen = l;
    }
    uint8_t *sa = (uint8_t *)malloc(maxlen ? maxlen : 1);
    uint8_t *sb = (uint8_t *)malloc(maxlen ? maxlen : 1);
    if (!sa || !sb) { free(sa); free(sb); return -1; }
    for (int32_t t = 0; t < n_texts; t++) {
        const uint8_t *page = buf + t_offs[t];
        int64_t len = t_offs[t + 1] - t_offs[t];
        int64_t n0 = em->n;
        int flag = 0;
        int64_t la = strip_comments(page, len, sa);
        int64_t lb = strip_boiler(sa, la, sb, &flag);
        if (!flag) {
            Sink sk = {ac, 0, t, em, 1, 0, NULL, 0};
            pass3(et, sb, lb, &sk, &flag);
            if (!flag) sink_finish(&sk);
        }
        /* rewind a flagged page's entries; stale stamp slots are harmless
         * (stamp matches on t+1, and t only increases) */
        if (flag) { flags[t] = 1; em->n = n0; }
    }
    free(sa); free(sb);
    return em->n;
}

int64_t ac_scan_multi_html_agg(const AC *ac, const EntTable *et,
                               const uint8_t *buf, const int64_t *t_offs,
                               int32_t n_texts, int32_t *out, int64_t cap,
                               uint8_t *flags) {
    int32_t np = ac->n_patterns > 0 ? ac->n_patterns : 1;
    int32_t *stamp = (int32_t *)calloc(np, sizeof(int32_t));
    int64_t *slot = (int64_t *)malloc(np * sizeof(int64_t));
    if (!stamp || !slot) { free(stamp); free(slot); return -1; }
    Emit em = {out, cap, 0, stamp, slot};
    int64_t n = scan_multi_html_impl(ac, et, buf, t_offs, n_texts, &em, flags);
    free(stamp); free(slot);
    return n;
}

/* ================================================================== */
/* Sentence-scoped scan for relation extraction (operators/relations.py).
 *
 * The relations lane needs, per SENTENCE (not per page): the padded
 * folded sentence text plus (first-occurrence position, phrase length,
 * pattern) for every vocabulary phrase it contains — the grouped shape
 * operators/relations.grouped_mentions builds from a sentence-explode +
 * token-explode + broadcast join + groupBy. This entry point produces it
 * in ONE C pass per page: split, fold, match, group — no corpus shuffle.
 *
 * Contract (must equal the Catalyst path, pinned in tests/test_relations):
 *   - sentence split = Spark split(text, "(?<=[.!?])\\s+") with Java
 *     \s = [ \t\n\x0B\f\r]: a delimiter is a maximal ASCII-space run whose
 *     first byte is directly preceded by '.', '!' or '?'; sent_id counts
 *     ALL parts (posexplode), including empty/hitless ones.
 *   - fold = lower + [^a-z0-9]+ -> ' ' + collapse + trim, then pad with
 *     one space each side — byte-level fold is exact except U+0130/U+212A
 *     (str.lower() emits ASCII alnums); pages containing either byte
 *     sequence are FLAGGED (flags[t] = 1, output rewound) and the caller
 *     re-runs them through the Python split+fold with pre_split = 1.
 *   - pos = 1-based index of the FIRST " phrase " occurrence in the
 *     padded sentence (== F.instr), valid because folded text is pure
 *     ASCII so bytes == chars.
 * Only sentences with >= 1 hit are emitted (join semantics). Outputs use
 * the usual count-and-retry protocol: counts[] = {n_sents, n_hits,
 * n_fold_bytes} totals; entries beyond the caps are counted, not written.
 */

static inline int java_space(uint8_t c) {
    return c == 0x20 || (c >= 0x09 && c <= 0x0D);
}

typedef struct {
    int32_t *sent_out;   /* 3 per sentence: page_idx, sent_id, n_hits */
    int64_t  sent_cap, n_sents;
    uint8_t *fold_out;   /* concatenated padded folded sentences */
    int64_t  fold_cap, n_fold;
    int64_t *fold_offs;  /* sent_cap + 1; [0] caller-zeroed */
    int32_t *hit_out;    /* 2 per hit: pat_idx, pos(1-based) */
    int64_t  hit_cap, n_hits;
    int64_t *stamp;      /* n_patterns: scount of last emit, first-only */
    int64_t  scount;
    const int64_t *pat_offs;  /* pattern byte offsets (for lengths) */
} SentEmit;

static inline int sent_emit_hit(SentEmit *se, int32_t pat, int64_t end_i) {
    if (se->stamp[pat] == se->scount) return 0; /* first occurrence only */
    se->stamp[pat] = se->scount;
    if (se->n_hits < se->hit_cap) {
        int64_t plen = se->pat_offs[pat + 1] - se->pat_offs[pat];
        se->hit_out[2 * se->n_hits] = pat;
        /* match ends at byte end_i (0-based, the trailing pad space);
         * 1-based start = end_i - plen + 2 */
        se->hit_out[2 * se->n_hits + 1] = (int32_t)(end_i - plen + 2);
    }
    se->n_hits++;
    return 1;
}

/* scan ONE padded folded sentence; returns hits emitted */
static int32_t scan_sentence(const AC *ac, const uint8_t *s, int64_t L,
                             SentEmit *se) {
    int32_t nh = 0;
    int32_t state = 0;
    int64_t i = 0;
    se->scount++;
    while (i < L) {
        if (state == 0) {
            const uint8_t *p = memchr(s + i, ' ', (size_t)(L - i));
            if (!p) break;
            i = (p - s) + 1;
            state = ac->s1;
            continue;
        }
        uint8_t c = s[i];
        int32_t g;
        for (;;) {
            g = (state == 0) ? (c == ' ' ? ac->s1 : 0)
                : (state == ac->s1) ? ac->s1_next[c]
                                    : ht_get(ac, state, c);
            if (g > 0) { state = g; break; }
            if (state == 0) break;
            state = ac->fail[state];
        }
        i++;
        if (g <= 0) continue;
        int32_t u = state;
        if (ac->out[u] >= 0) nh += sent_emit_hit(se, ac->out[u], i - 1);
        u = ac->olink[u];
        while (u >= 0) {
            nh += sent_emit_hit(se, ac->out[u], i - 1);
            u = ac->olink[u];
        }
    }
    return nh;
}

static void sent_commit(SentEmit *se, int32_t page, int32_t sid, int32_t nh,
                        const uint8_t *padded, int64_t L) {
    if (se->n_sents < se->sent_cap) {
        se->sent_out[3 * se->n_sents] = page;
        se->sent_out[3 * se->n_sents + 1] = sid;
        se->sent_out[3 * se->n_sents + 2] = nh;
        if (se->n_fold + L <= se->fold_cap)
            memcpy(se->fold_out + se->n_fold, padded, L);
        se->fold_offs[se->n_sents + 1] = se->fold_offs[se->n_sents] + L;
    }
    se->n_fold += L;
    se->n_sents++;
}

/* raw page text -> per-sentence fold + scan; returns 0, or 1 = page
 * flagged (exotic-lower bytes: Python path decides) */
static int scan_page_sentences(const AC *ac, const uint8_t *page, int64_t len,
                               int32_t page_idx, uint8_t *scratch,
                               SentEmit *se) {
    int64_t i = 0;
    int32_t sid = 0;
    for (;;) {
        /* current part = page[i .. sent_end); delimiter = java-space run
         * whose first byte is preceded by [.!?] (the preceding byte at
         * j == i is the previous delimiter's last space — never [.!?]) */
        int64_t j = i, sent_end = len, delim_end = -1;
        while (j < len) {
            if (java_space(page[j]) && j > 0 &&
                (page[j - 1] == '.' || page[j - 1] == '!' || page[j - 1] == '?')) {
                sent_end = j;
                delim_end = j + 1;
                while (delim_end < len && java_space(page[delim_end])) delim_end++;
                break;
            }
            j++;
        }
        /* fold page[i..sent_end) into padded scratch */
        int64_t L = 0;
        scratch[L++] = ' ';
        int pending = 0, any = 0;
        for (int64_t k = i; k < sent_end; k++) {
            uint8_t c = page[k];
            uint8_t f = fold_byte(c);
            if (!f) {
                if (c == 0xC4 && k + 1 < sent_end && page[k + 1] == 0xB0)
                    return 1; /* U+0130 */
                if (c == 0xE2 && k + 2 < sent_end && page[k + 1] == 0x84 &&
                    page[k + 2] == 0xAA)
                    return 1; /* U+212A */
                pending = 1;
                continue;
            }
            if (any && pending) scratch[L++] = ' ';
            pending = 0;
            scratch[L++] = f;
            any = 1;
        }
        if (any) {
            scratch[L++] = ' ';
            int32_t nh = scan_sentence(ac, scratch, L, se);
            if (nh > 0) sent_commit(se, page_idx, sid, nh, scratch, L);
        }
        sid++;
        if (delim_end < 0) break;
        i = delim_end;
        if (i >= len) { /* trailing delimiter: one final empty part */
            break;
        }
    }
    return 0;
}

/* pre_split = 0: texts are raw page texts (split+fold here; exotic-lower
 * pages get flags[t] = 1 and their output rewound). pre_split = 1: each
 * text IS one padded folded sentence (page_idx = t, sent_id = 0) — the
 * Python-fallback re-entry for flagged pages. Returns 0, -1 on alloc
 * failure; caller retries when counts exceed caps. */
int32_t ac_scan_sentences(const AC *ac, const uint8_t *buf,
                          const int64_t *t_offs, int32_t n_texts,
                          const int64_t *pat_offs, int32_t pre_split,
                          int32_t *sent_out, int64_t sent_cap,
                          uint8_t *fold_out, int64_t fold_cap,
                          int64_t *fold_offs,
                          int32_t *hit_out, int64_t hit_cap,
                          int64_t *counts, uint8_t *flags) {
    int32_t np = ac->n_patterns > 0 ? ac->n_patterns : 1;
    int64_t *stamp = (int64_t *)calloc(np, sizeof(int64_t));
    if (!stamp) return -1;
    uint8_t *scratch = NULL;
    if (!pre_split) {
        int64_t maxlen = 0;
        for (int32_t t = 0; t < n_texts; t++) {
            int64_t l = t_offs[t + 1] - t_offs[t];
            if (l > maxlen) maxlen = l;
        }
        scratch = (uint8_t *)malloc(maxlen + 3);
        if (!scratch) { free(stamp); return -1; }
    }
    SentEmit se = {sent_out, sent_cap, 0, fold_out, fold_cap, 0,
                   fold_offs, hit_out, hit_cap, 0, stamp, 0, pat_offs};
    if (sent_cap > 0) fold_offs[0] = 0;
    for (int32_t t = 0; t < n_texts; t++) {
        const uint8_t *page = buf + t_offs[t];
        int64_t len = t_offs[t + 1] - t_offs[t];
        if (pre_split) {
            int32_t nh = scan_sentence(ac, page, len, &se);
            if (nh > 0) sent_commit(&se, t, 0, nh, page, len);
            continue;
        }
        int64_t s0 = se.n_sents, h0 = se.n_hits, f0 = se.n_fold;
        if (scan_page_sentences(ac, page, len, t, scratch, &se)) {
            /* rewind the flagged page (stale stamps are harmless: scount
             * only increases) */
            flags[t] = 1;
            se.n_sents = s0; se.n_hits = h0; se.n_fold = f0;
        }
    }
    counts[0] = se.n_sents;
    counts[1] = se.n_hits;
    counts[2] = se.n_fold;
    free(stamp);
    free(scratch);
    return 0;
}

/* Debug/equivalence entry: folded token stream ("tok1 tok2", no pads)
 * for ONE page — must equal ' '.join(tokens_from_html_py(html)) when not
 * flagged. out must hold >= len bytes (output never exceeds input: every
 * entity replacement is shorter than its source). Returns bytes written;
 * *flagged = 1 when the page needs the Python path. */
int64_t extract_fold_debug(const EntTable *et, const uint8_t *in, int64_t len,
                           uint8_t *out, int32_t *flagged) {
    uint8_t *sa = (uint8_t *)malloc(len ? len : 1);
    uint8_t *sb = (uint8_t *)malloc(len ? len : 1);
    if (!sa || !sb) { free(sa); free(sb); return -1; }
    int flag = 0;
    int64_t la = strip_comments(in, len, sa);
    int64_t lb = strip_boiler(sa, la, sb, &flag);
    int64_t wrote = 0;
    if (!flag) {
        Sink sk = {NULL, 0, 0, NULL, 1, 0, out, 0};
        pass3(et, sb, lb, &sk, &flag);
        wrote = sk.dbg_n;
    }
    *flagged = flag;
    free(sa); free(sb);
    return flag ? 0 : wrote;
}
