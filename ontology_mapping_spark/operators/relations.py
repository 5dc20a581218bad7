"""Relation extraction: co-occurring entity mentions -> (subj, pred, obj).

The north rule's first stage is *triple extraction* from web pages. The
pipeline's S7 already emits mention triples (concept, kg:mentionedIn, url)
and linking triples; this module adds the relations BETWEEN entities that
a KG actually stores — derived from sentence-level co-occurrence, the
standard distant-supervision signal:

* :func:`split_sentences` — page text -> one row per sentence (posexplode;
  a generator projection, no shuffle).
* :func:`sentence_mentions` — entity mentions per sentence via the same
  first-token blocking shape as operators/mentions.mentions_via_join
  (broadcast vocabulary equi-join + JVM containment verify), plus the
  first-occurrence position needed for pattern extraction.
* :func:`cooccurrence_edges` — (subj, obj, n_sents): unordered concept
  pairs co-occurring in a sentence, counted over the corpus. The generic
  "relatedTo" edge list; also the similarity-edge input canonicalization
  (connected_components) consumes.
* :func:`pattern_relations` — typed predicates from the text BETWEEN two
  mentions: exact folded-token matches ('is a' -> kg:isA, 'part of' ->
  kg:partOf, 'located in' -> kg:locatedIn by default, caller-extensible).
  Hearst-pattern distant supervision, kept deliberately exact-match so
  the engine, the DuckDB oracle and the pytest twin share one contract.

Matching contract (documented, shared by all three derivations): sentence
folding is lower + non-alphanumeric->space + collapse; a phrase matches on
space-padded containment (whole-token); the mention position is the FIRST
occurrence; an ordered pair (A before B, non-overlapping) contributes to
pattern_relations iff the folded between-text equals a predicate pattern
exactly. Co-occurrence counts each unordered pair once per sentence.

Scale notes (100 TB): sentences and mentions are generator projections +
one broadcast equi-join riding the S1 scan — the corpus is not shuffled,
and mention rows are unique by construction (the vocabulary is deduped
BEFORE broadcast, not the corpus-sized output after). Both consumers
group mentions per sentence ONCE (:func:`grouped_mentions`, the only
exchange of the mention table) and enumerate pairs WITHIN-ROW via
higher-order functions — the O(k^2) pair algebra never hits the shuffle,
and the per-sentence triple dedup is an array_distinct, not a global
dropDuplicates. Measured on 95k synthetic pages (3.8M mentions, avg 11
per mention-bearing sentence): pattern 16.1s -> 3.1s, co-occurrence
37.4s -> 3.7s at local[32] vs the pair self-join form. Both final
aggregates are partial+final on the triple key — hot entity pairs
(celebrities) collapse map-side like the link-graph host counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# default exact-match predicate patterns over the folded between-text
DEFAULT_PATTERNS: dict[str, str] = {
    "is a": "kg:isA",
    "is an": "kg:isA",
    "is the": "kg:isA",
    "part of": "kg:partOf",
    "is part of": "kg:partOf",
    "located in": "kg:locatedIn",
    "in": "kg:locatedIn",
}


def fold_sentence(col: Column | str) -> Column:
    """lower + non-alphanumeric -> space + collapse + trim."""
    col = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "), r" +", " ")
    )


def split_sentences(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(url, text) -> (url, sent_id, sentence). Boundary = whitespace after
    sentence punctuation (lookbehind split); empty sentences dropped."""
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.posexplode(F.split(F.col(text_col), r"(?<=[.!?])\s+")).alias(
                "sent_id", "sentence"
            ),
        )
        .filter(F.trim(F.col("sentence")) != "")
    )


def sentence_mentions(sentences: DataFrame, phrases: DataFrame) -> DataFrame:
    """(url, sent_id, sentence) × (uri, phrase) ->
    (url, sent_id, uri, surface, pos, mlen) — pos is the 1-based index of
    the FIRST whole-token occurrence inside the space-padded folded
    sentence; mlen the phrase length. Phrases must arrive pre-folded
    (ontology label_phrases already are).

    Blocking mirrors mentions_via_join: a sentence can only contain a
    phrase if it contains its first token, so explode distinct sentence
    tokens and equi-join to broadcast (first_token, uri, phrase) rows,
    then verify whole-phrase containment with one JVM instr."""
    folded = sentences.select(
        "url", "sent_id", fold_sentence("sentence").alias("fs")
    ).withColumn("padded", F.concat(F.lit(" "), F.col("fs"), F.lit(" ")))
    toks = folded.select(
        "url", "sent_id", "padded",
        F.explode(F.array_distinct(F.split("fs", " "))).alias("token"),
    )
    # dedupe the SMALL side before broadcast: with unique (uri, phrase)
    # vocab rows and array_distinct sentence tokens, each (sentence, uri,
    # phrase) joins at most once — the corpus-sized output needs no
    # dropDuplicates (which would shuffle it)
    vocab = phrases.select("uri", "phrase").dropDuplicates().select(
        F.split(F.col("phrase"), " ").getItem(0).alias("token"), "uri", "phrase"
    )
    hits = (
        toks.join(F.broadcast(vocab), "token")
        .withColumn(
            "pos", F.instr(F.col("padded"), F.concat(F.lit(" "), F.col("phrase"), F.lit(" ")))
        )
        .filter(F.col("pos") > 0)
    )
    return hits.select(
        "url", "sent_id", "uri",
        F.col("phrase").alias("surface"),
        "pos",
        F.length("phrase").alias("mlen"),
        "padded",
    )


GROUPED_MENTIONS_SCHEMA = (
    "url string, sent_id int, padded string, "
    "ms array<struct<pos:int,mlen:int,uri:string>>"
)

# Python twin of the Catalyst sentence split + fold (and of the C kernel's
# byte-level form): Java regex \s is exactly [ \t\n\x0B\f\r]
_SENT_SPLIT = None


def _py_sentence_parts(text: str) -> list[tuple[int, str]]:
    """(sent_id, padded folded sentence) per NON-EMPTY-folding part —
    the pure-Python twin of split_sentences + fold_sentence + padding,
    used for C-flagged pages (exotic-lower code points) and compiler-less
    hosts. sent_id counts ALL split parts, like posexplode."""
    global _SENT_SPLIT
    import re

    if _SENT_SPLIT is None:
        _SENT_SPLIT = re.compile(r"(?<=[.!?])[ \t\n\x0b\f\r]+")
    out = []
    for sid, part in enumerate(_SENT_SPLIT.split(text)):
        folded = re.sub(r"[^a-z0-9]+", " ", part.lower()).strip(" ")
        if folded:
            out.append((sid, " " + folded + " "))
    return out


def _py_group_rows(vocab_rows, texts: list[str | None]):
    """Compiler-less full fallback: (page_idx, sent_id, padded, ms-list)
    tuples via the first-token blocked index + str.find — same contract,
    interpreter-bound (the degradation path for heterogeneous hosts)."""
    index: dict[str, list] = {}
    for uri, phrase in vocab_rows:
        toks = phrase.split()
        if toks:
            index.setdefault(toks[0], []).append(
                (" " + phrase + " ", len(phrase), uri)
            )
    rows = []
    for i, text in enumerate(texts):
        if not text:
            continue
        for sid, padded in _py_sentence_parts(text):
            cands = set(padded.split()).intersection(index)
            ms = []
            for t in sorted(cands):
                for pp, mlen, uri in index[t]:
                    at = padded.find(pp)
                    if at >= 0:
                        ms.append({"pos": at + 1, "mlen": mlen, "uri": uri})
            if ms:
                rows.append((i, sid, padded, ms))
    return rows


def sentence_mention_groups(
    pages: DataFrame,
    phrases: DataFrame,
    impl: str = "auto",
) -> DataFrame:
    """(url, text) × (uri, phrase) -> the GROUPED mention table
    (url, sent_id, padded, ms) of every mention-bearing sentence, ready
    for the within-row pair consumers — the fused form of
    ``group_mention_rows(sentence_mentions(split_sentences(pages), ...))``.

    ``impl``:

    * "auto" — "cnative" when the C scanner compiles on this host, else
      the declarative "join" path.
    * "cnative" — ONE C call per Arrow batch does sentence split, fold,
      Aho-Corasick first-position match and per-sentence grouping
      (native/acscan.c ac_scan_sentences), consuming the page bytes
      zero-copy from the Arrow buffer. The ~30x sentence explode, the
      token explode, the broadcast join AND the (url, sent_id) groupBy
      exchange all disappear — the corpus never shuffles before the final
      triple aggregate. Pages containing U+0130/U+212A (the two code
      points whose str.lower() emits ASCII alnums — textnorm's
      _EXOTIC_LOWER contract) are flagged by the C pass and re-run
      through the Python split+fold, so results always equal the
      Catalyst path (equivalence pinned in tests/test_relations.py).
      Hosts without a compiler degrade to a pure-Python per-page scan,
      same results.
    * "join" — the Catalyst path (split_sentences -> sentence_mentions ->
      group_mention_rows), always available, the reference the kernel is
      tested against.

    Page urls are the group key downstream; rows are grouped per page ROW
    here, so duplicate urls in ``pages`` should be deduplicated first
    (everywhere in this engine the url IS the page key). The vocabulary
    rides a Spark broadcast — ontology-sized by contract, same as
    mentions_via_trie (see mentions.py gazetteer notes for the crossover
    to the blocking join when it is not)."""
    from ontology_mapping_spark.operators.mentions import (
        _cached_matcher,
        _mint_scanner_key,
        _native_available,
        canonical_phrase_rows,
    )

    if impl == "auto":
        impl = "cnative" if _native_available() else "join"
    if impl == "join":
        return group_mention_rows(
            sentence_mentions(split_sentences(pages), phrases)
        )
    if impl != "cnative":
        raise ValueError(f"unknown impl {impl!r}")
    spark = pages.sparkSession
    rows = canonical_phrase_rows(
        [(r["uri"], r["phrase"]) for r in phrases.select("uri", "phrase").collect()]
    )
    bc = spark.sparkContext.broadcast(rows)
    cache_key = _mint_scanner_key("cnative-sent")

    def scan(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            url_col = b.column("url")
            m = _cached_matcher(bc, cache_key)
            if not hasattr(m, "scan_sentences"):
                texts = b.column("text").to_pylist()
                py_rows = _py_group_rows(bc.value, texts)
                if py_rows:
                    idx = pa.array([r[0] for r in py_rows], type=pa.int64())
                    yield pa.RecordBatch.from_arrays(
                        [
                            url_col.take(idx),
                            pa.array([r[1] for r in py_rows], type=pa.int32()),
                            pa.array([r[2] for r in py_rows], type=pa.string()),
                            pa.array(
                                [r[3] for r in py_rows],
                                type=pa.list_(
                                    pa.struct(
                                        [("pos", pa.int32()), ("mlen", pa.int32()),
                                         ("uri", pa.string())]
                                    )
                                ),
                            ),
                        ],
                        names=["url", "sent_id", "padded", "ms"],
                    )
                continue
            page_idx, sent_id, nh, padded, pat_idx, pos, flags = m.scan_sentences(
                b.column("text")
            )
            if len(page_idx):
                yield pa.RecordBatch.from_arrays(
                    [
                        url_col.take(pa.array(page_idx)),
                        pa.array(sent_id, type=pa.int32()),
                        padded,
                        m.expand_sentence_hits(nh, pat_idx, pos),
                    ],
                    names=["url", "sent_id", "padded", "ms"],
                )
            flagged = np.nonzero(flags)[0]
            if flagged.size:
                text_col = b.column("text")
                parts, fpage, fsid = [], [], []
                for i in flagged:
                    t = text_col[int(i)].as_py()
                    for sid, pad in _py_sentence_parts(t or ""):
                        parts.append(pad.encode("utf-8"))
                        fpage.append(int(i))
                        fsid.append(sid)
                if parts:
                    p2, _z, nh2, padded2, pat2, pos2, _f = m.scan_sentences(
                        parts, pre_split=True
                    )
                    if len(p2):
                        fpage = np.asarray(fpage, dtype=np.int64)
                        fsid = np.asarray(fsid, dtype=np.int32)
                        yield pa.RecordBatch.from_arrays(
                            [
                                url_col.take(pa.array(fpage[p2])),
                                pa.array(fsid[p2], type=pa.int32()),
                                padded2,
                                m.expand_sentence_hits(nh2, pat2, pos2),
                            ],
                            names=["url", "sent_id", "padded", "ms"],
                        )

    return pages.select("url", "text").mapInArrow(
        scan, schema=GROUPED_MENTIONS_SCHEMA
    )


def group_mention_rows(mentions: DataFrame) -> DataFrame:
    """Per-hit mention rows -> (url, sent_id, padded, ms:
    array<struct<pos,mlen,uri>>), one row per mention-bearing sentence
    with NO minimum-size filter — the grouped shape every pair consumer
    starts from, and the contract :func:`sentence_mention_groups`'s
    native kernel produces without this exchange."""
    return mentions.groupBy("url", "sent_id").agg(
        F.max("padded").alias("padded"),
        F.collect_list(F.struct("pos", "mlen", "uri")).alias("ms"),
    )


def _as_groups(m: DataFrame) -> DataFrame:
    """Accept either per-hit mention rows or an already-grouped table
    (anything carrying an ``ms`` column, e.g. the native kernel output)."""
    return m if "ms" in m.columns else group_mention_rows(m)


def grouped_mentions(
    mentions: DataFrame, max_mentions: int | None = None
) -> DataFrame:
    """(url, sent_id, padded, ms: array<struct<pos,mlen,uri>>) for
    sentences with >= 2 mentions — the ONE exchange both pair consumers
    share; pair enumeration stays within-row after it. Accepts per-hit
    mention rows OR a pre-grouped table (see :func:`_as_groups`); with
    the native sentence kernel upstream there is no exchange here at all.

    ``max_mentions`` is the df-cap analog for pathological rows (a page
    whose "sentence" is a 10^4-entity list would otherwise cost O(k^2)
    in-row): when set, keep the first ``max_mentions`` mentions in
    (pos, mlen, uri) order — deterministic, text-order, and the cap is
    loud in the plan (a slice), never silent truncation by Spark."""
    g = _as_groups(mentions)
    if max_mentions is not None:
        g = g.withColumn(
            "ms", F.slice(F.array_sort("ms"), 1, int(max_mentions))
        )
    return g.filter(F.size("ms") >= 2)


def typed_triples_expr(
    ms: Column, padded: Column, patterns: dict[str, str]
) -> Column:
    """array<struct<subj,pred,obj>> of typed triples for ONE sentence,
    given its mention array ``ms`` (struct<pos,mlen,uri>) and its padded
    folded text — the WITHIN-ROW pair algebra shared by the batch
    aggregate (:func:`pattern_relations`) and the stateless streaming
    extractor (streaming/relations_stream.py), so the two cannot drift.

    Ordered non-overlapping pairs (B strictly after A's surface), typed
    by exact between-text lookup; per-sentence dedup is an
    array_distinct."""

    def lookup(between):
        # when-chain beats a create_map literal here: inside a lambda the
        # map expression is re-built per array element, the when-chain is
        # plain comparisons
        out = F.lit(None).cast("string")
        for text, pred in sorted(patterns.items(), reverse=True):
            out = F.when(between == text, F.lit(pred)).otherwise(out)
        return out

    def raw_pair(a, b):
        # A's surface spans padded[a.pos .. a.pos+a.mlen-1] (1-based);
        # the folded text strictly between A and B, trimmed — computed
        # ONCE per pair here, looked up in a second cheap transform
        between = F.trim(
            padded.substr(a["pos"] + a["mlen"] + 1, b["pos"] - a["pos"] - a["mlen"])
        )
        return F.struct(
            a["uri"].alias("subj"), between.alias("btw"), b["uri"].alias("obj")
        )

    pairs = F.flatten(
        F.transform(
            ms,
            lambda a: F.transform(
                F.filter(
                    ms,
                    lambda b: (b["pos"] > a["pos"] + a["mlen"])
                    & (b["uri"] != a["uri"]),
                ),
                lambda b: raw_pair(a, b),
            ),
        )
    )
    return F.array_distinct(
        F.filter(
            F.transform(
                pairs,
                lambda p: F.struct(
                    p["subj"].alias("subj"),
                    lookup(p["btw"]).alias("pred"),
                    p["obj"].alias("obj"),
                ),
            ),
            lambda t: t["pred"].isNotNull(),
        )
    )


def sentence_mentions_expr(padded: Column, vocab: Column) -> Column:
    """array<struct<pos,mlen,uri>> of first-occurrence whole-token phrase
    hits for ONE padded folded sentence, given a LITERAL vocabulary array
    (struct<uri,phrase>) — the within-row twin of
    :func:`sentence_mentions` for contexts where a join+regroup is not
    available (stateless streaming). O(|vocab|) instr per sentence, so
    only for ontology-sized vocabularies (same literal-broadcast
    precedent as the LSH hyperplanes in operators/similarity.py)."""
    return F.filter(
        F.transform(
            vocab,
            lambda v: F.struct(
                F.instr(padded, F.concat(F.lit(" "), v["phrase"], F.lit(" "))).alias(
                    "pos"
                ),
                F.length(v["phrase"]).alias("mlen"),
                v["uri"].alias("uri"),
            ),
        ),
        lambda m: m["pos"] > 0,
    )


def cooccurrence_edges(
    mentions: DataFrame, max_mentions: int | None = None
) -> DataFrame:
    """Sentence mentions -> (subj, obj, n_sents), subj < obj lexically,
    each unordered concept pair counted once per sentence. Pairs are
    enumerated within-row over the sorted-distinct uri array (upper
    triangle by slice), so only (group shuffle + final agg) exchange."""
    uris = F.array_sort(F.array_distinct("ms.uri"))
    pairs = F.flatten(
        F.transform(
            uris,
            lambda a, i: F.transform(
                F.slice(uris, i + 2, F.size(uris)),
                lambda b: F.struct(a.alias("subj"), b.alias("obj")),
            ),
        )
    )
    return (
        grouped_mentions(mentions, max_mentions)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.subj").alias("subj"), F.col("p.obj").alias("obj"))
        .agg(F.count("*").alias("n_sents"))
    )


def pattern_relations(
    mentions: DataFrame,
    patterns: dict[str, str] | None = None,
    max_mentions: int | None = None,
) -> DataFrame:
    """Sentence mentions -> typed (subj, pred, obj, n) triples.

    For every ordered non-overlapping mention pair in a sentence, the
    folded text strictly between the two surfaces is compared EXACTLY
    against the pattern table; matches aggregate to corpus-level support
    counts. Distinct surface pairs within one sentence each contribute."""
    return (
        typed_relation_rows(mentions, patterns, max_mentions)
        .groupBy("subj", "pred", "obj")
        .agg(F.count("*").alias("n"))
    )


def typed_relation_rows(
    mentions: DataFrame,
    patterns: dict[str, str] | None = None,
    max_mentions: int | None = None,
) -> DataFrame:
    """(url, sent_id, subj, pred, obj) — the pre-aggregation form of
    :func:`pattern_relations`: one row per distinct typed triple per
    sentence. Used for provenance-keyed evaluation (gold joins on url)
    and anywhere the per-page triples themselves are the product."""
    patterns = DEFAULT_PATTERNS if patterns is None else patterns
    triples = typed_triples_expr(F.col("ms"), F.col("padded"), patterns)
    return (
        grouped_mentions(mentions, max_mentions)
        .select("url", "sent_id", F.explode(triples).alias("t"))
        .select(
            "url",
            "sent_id",
            F.col("t.subj").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
        )
    )


def relation_confidence(mentions: DataFrame, max_mentions: int | None = None) -> DataFrame:
    """Co-occurrence edges weighted by normalized PMI — the standard
    distant-supervision noise filter (celebrity entities co-occur with
    everything; NPMI discounts that).

    (subj, obj, n_sents, npmi) with npmi in [-1, 1]:
    ``npmi = ln(p(s,o) / (p(s) p(o))) / -ln p(s,o)`` where probabilities
    are over the N mention-bearing sentences in the mention table.

    Scale shape: per-entity sentence counts are one partial+final agg on
    uri (vocabulary-sized result, broadcast back onto the edge list); N
    rides in via a 1-row aggregate cross-joined broadcast — no driver
    round-trip, no corpus re-scan. Input may be per-hit mention rows or
    the grouped table (:func:`sentence_mention_groups`); the grouped form
    derives ent/total WITHOUT the two distinct-shuffles the per-hit form
    needed (a group row IS a distinct (url, sent_id))."""
    g = _as_groups(mentions)
    edges = cooccurrence_edges(g, max_mentions)
    ent = (
        g.select(F.explode(F.array_distinct("ms.uri")).alias("uri"))
        .groupBy("uri")
        .agg(F.count("*").alias("n_ent"))
    )
    total = g.agg(F.count("*").alias("n_total"))
    p_so = F.col("n_sents") / F.col("n_total")
    p_s = F.col("n_subj") / F.col("n_total")
    p_o = F.col("n_obj") / F.col("n_total")
    return (
        edges.join(F.broadcast(ent.withColumnRenamed("uri", "subj")), "subj")
        .withColumnRenamed("n_ent", "n_subj")
        .join(F.broadcast(ent.withColumnRenamed("uri", "obj")), "obj")
        .withColumnRenamed("n_ent", "n_obj")
        .crossJoin(F.broadcast(total))
        .select(
            "subj",
            "obj",
            "n_sents",
            # p(s,o)=1 makes -ln p(s,o) = 0 (0/0): perfect association,
            # npmi := 1 by convention
            F.when(F.col("n_sents") == F.col("n_total"), F.lit(1.0))
            .otherwise(F.log(p_so / (p_s * p_o)) / -F.log(p_so))
            .alias("npmi"),
        )
    )


def extract_relations(
    pages: DataFrame,
    phrases: DataFrame,
    patterns: dict[str, str] | None = None,
    max_mentions: int | None = None,
    impl: str = "auto",
) -> tuple[DataFrame, DataFrame]:
    """pages × phrase vocabulary -> (cooccurrence_edges, pattern_triples).

    One grouped sentence-mention table (:func:`sentence_mention_groups`,
    the fused C scan when available) feeds both consumers; callers running
    both at corpus scale should persist it so the page scan executes
    once."""
    g = sentence_mention_groups(pages, phrases, impl=impl)
    return (
        cooccurrence_edges(g, max_mentions),
        pattern_relations(g, patterns, max_mentions),
    )
