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
 * Emits one (text_idx, pattern_id) int32 pair per OCCURRENCE into out
 * (capacity `cap` pairs); always returns the total number of occurrences,
 * writing only the first `cap` — caller re-calls with a bigger buffer when
 * the return exceeds cap. Automaton state resets per text. One C call per
 * Arrow batch amortizes the Python->C transition over thousands of pages. */
int64_t ac_scan_multi(const AC *ac, const uint8_t *buf, const int64_t *t_offs,
                      int32_t n_texts, int32_t *out, int64_t cap) {
    int64_t n = 0;
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
            if (ac->out[u] >= 0) {
                if (n < cap) { out[2 * n] = t; out[2 * n + 1] = ac->out[u]; }
                n++;
            }
            u = ac->olink[u];
            while (u >= 0) {
                if (n < cap) { out[2 * n] = t; out[2 * n + 1] = ac->out[u]; }
                n++;
                u = ac->olink[u];
            }
        }
    }
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
 * Output pairs protocol identical to ac_scan_multi. */

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
            if (ac->out[u_] >= 0) {                                        \
                if (n < cap) { out[2 * n] = t; out[2 * n + 1] = ac->out[u_]; } \
                n++;                                                       \
            }                                                              \
            u_ = ac->olink[u_];                                            \
            while (u_ >= 0) {                                              \
                if (n < cap) { out[2 * n] = t; out[2 * n + 1] = ac->out[u_]; } \
                n++;                                                       \
                u_ = ac->olink[u_];                                        \
            }                                                              \
        } else {                                                           \
            state = 0;                                                     \
        }                                                                  \
    } while (0)

int64_t ac_scan_multi_fold(const AC *ac, const uint8_t *buf,
                           const int64_t *t_offs, int32_t n_texts,
                           int32_t *out, int64_t cap) {
    int64_t n = 0;
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
    return n;
}

#undef AC_FEED
