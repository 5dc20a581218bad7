"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (codegen'd, no
Python), designed for the documents/web_pages fact tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.textnorm import normalize_col

# small deterministic stopword profiles for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "por"],
}


def whitespace_token_count(text: Column) -> Column:
    """Whitespace token count of normalized text (0 for empty or NULL —
    a NULL would otherwise poison count-threshold predicates into
    three-valued logic, dropping rows from BOTH the kept and the
    complement set)."""
    n = normalize_col(text)
    return (
        F.when(n.isNull() | (n == ""), F.lit(0))
        .otherwise(F.size(F.split(n, " ")))
        .cast("int")
    )


def regex_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: count of [a-z]+ / digit-runs / single
    non-alnum symbols (the classic pre-tokenizer regex); 0 for NULL."""
    return F.coalesce(
        F.size(
            F.regexp_extract_all(
                F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
            )
        ),
        F.lit(0),
    ).cast("int")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of normalized tokens in the language's stopword profile
    (0.0 for empty/NULL). The token array is lambda-bound so the
    normalize regexes and the split run once per row, not once per
    reference (the detect_lang trap)."""
    from ontology_mapping_spark.functions.arrays import bind

    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])

    def _ratio(toks: Column) -> Column:
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        return F.when(
            F.size(toks) > 0, hits.cast("double") / F.size(toks)
        ).otherwise(0.0)

    return bind(F.split(normalize_col(text), " "), _ratio)


def detect_lang(text: Column, langs: list[str] | None = None) -> Column:
    """argmax over per-language stopword ratios; 'und' when all zero.
    (Heuristic language-ID — the real model slots into the same column.)

    The token array is lambda-bound and all per-language ratios live in
    one bound struct: the naive form embedded a full stopword_ratio
    (normalize + split + filter) ~2x per language in the greatest/when
    chain — ~20 normalize passes per row at 4 languages."""
    from ontology_mapping_spark.functions.arrays import bind

    langs = langs or list(LANG_STOPWORDS)

    def _contains(sw: Column):
        return lambda t: F.array_contains(sw, t)

    def _scores(toks: Column) -> Column:
        n = F.size(toks)
        fields = []
        for lg in langs:
            sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lg]])
            hits = F.size(F.filter(toks, _contains(sw)))
            fields.append(
                F.when(n > 0, hits.cast("double") / n).otherwise(0.0).alias(lg)
            )
        return F.struct(*fields)

    def _pick(s: Column) -> Column:
        scores = [s[lg] for lg in langs]
        best = F.greatest(*scores) if len(scores) > 1 else scores[0]
        out = F.lit("und")
        # reverse order so earlier langs win ties
        for lg, sc in reversed(list(zip(langs, scores))):
            out = F.when((sc == best) & (best > 0), F.lit(lg)).otherwise(out)
        return out

    return bind(bind(F.split(normalize_col(text), " "), _scores), _pick)


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / digit ratios — the standard
    web-text quality signals."""
    from ontology_mapping_spark.functions.arrays import bind

    raw_len = F.length(text)
    n = normalize_col(text)
    # per-entry lambda-binding: inside each returned column the
    # normalized text is a bound variable evaluated once, so an entry
    # referencing it several times (token count + char sum) costs one
    # normalize pass, not one per reference
    n_toks = bind(
        n, lambda nn: F.when(nn == "", 0).otherwise(F.size(F.split(nn, " ")))
    )
    # unicode-aware classes: accented/Greek letters are LETTERS, not
    # punctuation — [a-z]-only classes scored normal de/fr/es prose as
    # punctuation soup
    alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    digits = F.length(F.regexp_replace(text, r"[^\p{N}]", ""))
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    mean_tok_len = bind(
        n,
        lambda nn: bind(
            F.when(nn == "", 0).otherwise(F.size(F.split(nn, " "))),
            lambda nt: F.when(
                nt > 0,
                F.length(F.regexp_replace(nn, " ", "")).cast("double") / nt,
            ).otherwise(0.0),
        ),
    )
    return {
        "n_chars": raw_len.cast("int"),
        "n_tokens": n_toks.cast("int"),
        "mean_token_len": mean_tok_len,
        "alpha_ratio": F.when(raw_len > 0, alpha.cast("double") / raw_len).otherwise(0.0),
        "digit_ratio": F.when(raw_len > 0, digits.cast("double") / raw_len).otherwise(0.0),
        "punct_ratio": F.when(raw_len > 0, punct.cast("double") / raw_len).otherwise(0.0),
        "stopword_ratio": stopword_ratio(text, "en"),
    }


def quality_score(text: Column) -> Column:
    """Scalar [0,1] quality heuristic: rewards alpha-heavy, stopword-bearing
    prose with sane token lengths; penalizes punctuation/digit soup."""
    f = quality_features(text)
    tok_len_ok = F.when(
        (f["mean_token_len"] >= 2.5) & (f["mean_token_len"] <= 10.0), 1.0
    ).otherwise(0.0)
    score = (
        0.4 * f["alpha_ratio"]
        + 0.2 * F.least(f["stopword_ratio"] * F.lit(4.0), F.lit(1.0))
        + 0.2 * tok_len_ok
        + 0.2 * (1.0 - F.least(f["punct_ratio"] * F.lit(4.0), F.lit(1.0)))
    )
    return F.round(score, 6)


def fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of normalized text (dedup key)."""
    return F.md5(normalize_col(text))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kgram: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing (Schleimer et al.): per sliding window of ``window``
    consecutive character-k-gram hashes keep the minimum -> (id, fp) rows,
    the local-fingerprint set used for plagiarism-style containment
    detection. Pure Catalyst: substring k-grams + windowed min via
    transform over index sequences.

    Both the normalized text and the gram array are lambda-bound
    (functions/arrays.bind): referencing them as plain column aliases lets
    CollapseProject inline them back into the per-index lambdas, which
    re-derives the whole gram array per window position — O(n^2) md5s."""
    from ontology_mapping_spark.functions.arrays import bind

    def _grams(n: Column) -> Column:
        return F.when(
            F.length(n) >= kgram,
            F.transform(
                F.sequence(F.lit(1), F.length(n) - kgram + 1),
                lambda i: F.md5(n.substr(i, F.lit(kgram))),
            ),
        ).otherwise(F.array(F.md5(n)))

    def _mins(g: Column) -> Column:
        return F.array_distinct(
            F.when(
                F.size(g) >= window,
                F.transform(
                    F.sequence(F.lit(0), F.size(g) - window),
                    lambda i: F.array_min(F.slice(g, i + 1, window)),
                ),
            ).otherwise(F.array(F.array_min(g)))
        )

    mins = bind(bind(normalize_col(F.col(text_col)), _grams), _mins)
    return df.select(F.col(id_col), F.explode(mins).alias("fp"))


def frequent_phrase_mentions(
    docs: DataFrame,
    n: int = 2,
    min_df: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "aggregate",
) -> DataFrame:
    """(doc_id, phrase) hits for every n-token shingle whose document
    frequency is >= ``min_df`` (a corpus-derived phrase vocabulary — the
    degenerate 'ontology labels' of the flagship slice).

    ``form``:

    * ``"aggregate"`` (default, the 100 TB shape): partial/final hash
      aggregate counts per phrase — map-side combine collapses hot
      phrases BEFORE the shuffle, so a boilerplate bigram appearing in
      every document ("click here") moves one row per map task, not one
      row per document. The surviving vocabulary joins back onto a
      re-derived shingle scan WITHOUT a broadcast hint: at web scale the
      df >= min_df vocabulary itself grows with the corpus (an 8 GB
      broadcast ceiling would be a silent cliff), so Catalyst/AQE picks
      broadcast when the vocab is actually small and a shuffle join —
      whose per-phrase input skew AQE's skew-split CAN see and split,
      unlike output explosions — otherwise.
    * ``"window"`` — single-shuffle count-over-window variant. Shuffles
      the corpus' shingles once, but WindowExec buffers each phrase
      partition in memory, so one pathologically hot phrase OOMs an
      executor at scale. Opt-in for small corpora where the one-shuffle
      saving wins (crossover: when the full shingle table for the
      hottest phrase fits an executor's window buffer).
    """
    from ontology_mapping_spark.operators.dedup import token_shingles

    if form not in ("aggregate", "window"):
        raise ValueError(f"form must be 'aggregate' or 'window', got {form!r}")
    bigrams = docs.select(
        F.col(id_col),
        F.explode(token_shingles(F.col(text_col), n, short="empty")).alias("phrase"),
    )
    if form == "window":
        from pyspark.sql import Window

        w = Window.partitionBy("phrase")
        return (
            bigrams.withColumn("df", F.count("*").over(w))
            .filter(F.col("df") >= min_df)
            .select(id_col, "phrase")
        )
    # shingles are distinct per doc (array_distinct before explode), so
    # count(*) per phrase == count(DISTINCT doc) without a dedup shuffle
    vocab = (
        bigrams.groupBy("phrase")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("phrase")
    )
    return bigrams.join(vocab, "phrase").select(id_col, "phrase")


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition quality signals (the Gopher-rule family,
    Rae et al. 2021 §A1.1 — repetitious documents are low-quality training
    data): token count, distinct-token fraction, and the count/char-share
    of the most frequent bigram.

    Zero-shuffle: everything computes WITHIN the row via higher-order
    functions — the top-bigram count is the longest run in the SORTED
    bigram array (array_sort + one linear aggregate), not an
    explode + groupBy, so a 10^12-document corpus pays no exchange at all
    for per-doc stats. The fold state rides a (prev, run, best) struct."""
    from ontology_mapping_spark.functions.arrays import bind

    return df.select(F.col(id_col), _repetition_struct(text_col).alias("s")).select(
        id_col,
        F.col("s.n_tokens").alias("n_tokens"),
        _distinct_frac_col(),
        F.col("s.top_bigram_count").alias("top_bigram_count"),
        _top_bigram_frac_col(),
    )


def _distinct_frac_col() -> Column:
    return F.round(
        F.when(
            F.col("s.n_tokens") > 0, F.col("s.n_distinct") / F.col("s.n_tokens")
        ).otherwise(F.lit(0.0)),
        6,
    ).alias("distinct_token_frac")


def _top_bigram_frac_col() -> Column:
    return F.round(
        F.when(
            F.col("s.n_tokens") >= 2,
            F.col("s.top_bigram_count") / (F.col("s.n_tokens") - 1),
        ).otherwise(F.lit(0.0)),
        6,
    ).alias("top_bigram_frac")


def _repetition_struct(text_col: str) -> Column:
    """(n_tokens, n_distinct, top_bigram_count) struct, fully within-row —
    shared by :func:`repetition_stats` and :func:`corpus_filter`."""
    from ontology_mapping_spark.functions.arrays import bind

    toks = F.split(normalize_col(F.coalesce(F.col(text_col), F.lit(""))), " ")
    toks = F.filter(toks, lambda t: t != "")

    def _stats(tk: Column) -> Column:
        n = F.size(tk)
        bigr = F.when(
            n >= 2,
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.concat(
                        F.element_at(tk, i + 1), F.lit(" "), F.element_at(tk, i + 2)
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
        zero = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        top_bigram = F.aggregate(bigr, zero, step, lambda acc: acc["best"])
        return F.struct(
            n.alias("n_tokens"),
            F.size(F.array_distinct(tk)).alias("n_distinct"),
            top_bigram.alias("top_bigram_count"),
        )

    return bind(toks, _stats)


def corpus_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_distinct_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    min_stopword_ratio: float = 0.01,
    min_alpha_ratio: float = 0.5,
) -> DataFrame:
    """C4/Gopher-style corpus cleaning as ONE declarative projection:
    length bounds, repetition caps (distinct-token fraction, top-bigram
    share), stopword-profile language evidence and alpha-ratio quality —
    emitted per document with a ``keep`` verdict, so ``.filter("keep")``
    IS the cleaning pass. Every signal computes within the row (no
    shuffle at any corpus size); thresholds compare the 6-dp ROUNDED
    signals so the verdict is reproducible across engines (the DuckDB
    oracle re-derives signals and verdict relationally)."""
    rows = df.select(
        F.col(id_col),
        _repetition_struct(text_col).alias("s"),
        F.round(stopword_ratio(F.col(text_col), lang), 6).alias("stopword_ratio"),
        F.round(quality_features(F.col(text_col))["alpha_ratio"], 6).alias(
            "alpha_ratio"
        ),
    ).select(
        id_col,
        F.col("s.n_tokens").alias("n_tokens"),
        _distinct_frac_col(),
        _top_bigram_frac_col(),
        "stopword_ratio",
        "alpha_ratio",
    )
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("distinct_token_frac") >= min_distinct_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
    )
    return rows.withColumn("keep", keep)
