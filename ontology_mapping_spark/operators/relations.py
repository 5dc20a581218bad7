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
one broadcast equi-join riding the S1 scan — the corpus is not shuffled.
The pair self-join keys on (url, sent_id): per-sentence mention counts are
small constants, so the join output is O(#sentences), and both aggregates
are partial+final on (subj, pred, obj) — hot entity pairs (celebrities)
collapse map-side exactly like the link-graph host counts.
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
    vocab = phrases.select(
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
    ).dropDuplicates(["url", "sent_id", "uri", "surface"])


def cooccurrence_edges(mentions: DataFrame) -> DataFrame:
    """Sentence mentions -> (subj, obj, n_sents), subj < obj lexically,
    each unordered concept pair counted once per sentence."""
    a = mentions.select("url", "sent_id", F.col("uri").alias("subj"))
    b = mentions.select("url", "sent_id", F.col("uri").alias("obj"))
    pairs = (
        a.join(b, ["url", "sent_id"])
        .filter(F.col("subj") < F.col("obj"))
        .dropDuplicates(["url", "sent_id", "subj", "obj"])
    )
    return pairs.groupBy("subj", "obj").agg(F.count("*").alias("n_sents"))


def pattern_relations(
    mentions: DataFrame, patterns: dict[str, str] | None = None
) -> DataFrame:
    """Sentence mentions -> typed (subj, pred, obj, n) triples.

    For every ordered non-overlapping mention pair in a sentence, the
    folded text strictly between the two surfaces is compared EXACTLY
    against the pattern table; matches aggregate to corpus-level support
    counts. Distinct surface pairs within one sentence each contribute."""
    patterns = DEFAULT_PATTERNS if patterns is None else patterns
    pat = F.create_map(
        *[F.lit(x) for kv in sorted(patterns.items()) for x in kv]
    )
    a = mentions.select(
        "url", "sent_id", "padded",
        F.col("uri").alias("subj"), F.col("pos").alias("pa"), F.col("mlen").alias("la"),
    )
    b = mentions.select(
        "url", "sent_id",
        F.col("uri").alias("obj"), F.col("pos").alias("pb"), F.col("mlen").alias("lb"),
    )
    # A's surface spans padded[pa+1 .. pa+la]; require B to start after it
    pairs = a.join(b, ["url", "sent_id"]).filter(
        (F.col("pb") > F.col("pa") + F.col("la")) & (F.col("subj") != F.col("obj"))
    )
    between = F.trim(
        F.col("padded").substr(
            F.col("pa") + F.col("la") + 1, F.col("pb") - F.col("pa") - F.col("la")
        )
    )
    typed = (
        pairs.withColumn("pred", pat.getItem(between))
        .filter(F.col("pred").isNotNull())
        .dropDuplicates(["url", "sent_id", "subj", "pred", "obj"])
    )
    return typed.groupBy("subj", "pred", "obj").agg(F.count("*").alias("n"))


def extract_relations(
    pages: DataFrame,
    phrases: DataFrame,
    patterns: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """pages × phrase vocabulary -> (cooccurrence_edges, pattern_triples).

    One sentence-mention table feeds both consumers; callers running both
    at corpus scale should persist it (session.materialize) so the scan +
    broadcast join executes once."""
    m = sentence_mentions(split_sentences(pages), phrases)
    return cooccurrence_edges(m), pattern_relations(m, patterns)
