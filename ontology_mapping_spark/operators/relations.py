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


def grouped_mentions(
    mentions: DataFrame, max_mentions: int | None = None
) -> DataFrame:
    """(url, sent_id, padded, ms: array<struct<pos,mlen,uri>>) for
    sentences with >= 2 mentions — the ONE exchange both pair consumers
    share; pair enumeration stays within-row after it.

    ``max_mentions`` is the df-cap analog for pathological rows (a page
    whose "sentence" is a 10^4-entity list would otherwise cost O(k^2)
    in-row): when set, keep the first ``max_mentions`` mentions in
    (pos, mlen, uri) order — deterministic, text-order, and the cap is
    loud in the plan (a slice), never silent truncation by Spark."""
    g = mentions.groupBy("url", "sent_id").agg(
        F.max("padded").alias("padded"),
        F.collect_list(F.struct("pos", "mlen", "uri")).alias("ms"),
    )
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
    round-trip, no corpus re-scan."""
    edges = cooccurrence_edges(mentions, max_mentions)
    ent = (
        mentions.select("url", "sent_id", "uri")
        .distinct()
        .groupBy("uri")
        .agg(F.count("*").alias("n_ent"))
    )
    total = (
        mentions.select("url", "sent_id").distinct()
        .agg(F.count("*").alias("n_total"))
    )
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
) -> tuple[DataFrame, DataFrame]:
    """pages × phrase vocabulary -> (cooccurrence_edges, pattern_triples).

    One sentence-mention table feeds both consumers; callers running both
    at corpus scale should persist it (session.materialize) so the scan +
    broadcast join executes once."""
    m = sentence_mentions(split_sentences(pages), phrases)
    return (
        cooccurrence_edges(m, max_mentions),
        pattern_relations(m, patterns, max_mentions),
    )
