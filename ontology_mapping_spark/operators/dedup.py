"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its corpora are tiny ontologies); these are
the standard web-corpus dedup family, built Spark-first:

* :func:`exact_dedup` — hash-groupBy on the text digest, keep min id.
* :func:`line_dedup` — C4-style corpus-wide duplicate-LINE removal
  (keep the globally first occurrence; short lines exempt), built as a
  partial-aggregable min-winner groupBy, never a window over the line key.
* :func:`minhash_signatures` / :func:`lsh_candidates` /
  :func:`near_dup_pairs_minhash` — shingle -> k-permutation MinHash ->
  banded LSH bucket join -> exact-Jaccard verification. All hashing is
  md5-derived (deterministic, reproducible in any engine — no
  PYTHONHASHSEED / xxhash dependence).
* :func:`simhash` / :func:`near_dup_pairs_simhash` — 16..63-bit SimHash via
  per-token md5 bit votes; near-dups = small Hamming distance, candidates
  from band buckets, verified with bit_count(xor).
* :func:`near_dup_pairs_embedding` — cosine >= threshold over an embedding
  column (brute force within LSH sign-buckets; see operators/similarity.py
  for the ANN machinery).

Scale notes: every candidate generator is a bucket equi-join (shuffle on the
bucket key) — never an n² compare. Hot buckets (boilerplate shingles) are
the skew risk; the band hash includes the band id so buckets split across
bands, and AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ontology_mapping_spark.functions.arrays import bind as _bind
from ontology_mapping_spark.textnorm import normalize_col


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per exact text digest.

    Rows with NULL text pass through untouched: md5(NULL) is NULL, and a
    window key of NULL would group EVERY missing-text row into one
    partition and silently delete all but one of them — "text unknown"
    is not "texts equal"."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) | F.col(text_col).isNull())
        .drop("__rn")
    )


def token_shingles(text: Column, n: int = 3, short: str = "join") -> Column:
    """Distinct n-token shingles of normalized text (array<string>).

    The token array is lambda-bound (see :func:`_bind`) and shingles are a
    zip_with chain of shifted slices, so the normalize regexes and the split
    run exactly once per row regardless of n or downstream projection
    collapse.

    ``short`` picks the under-n-tokens policy: ``"join"`` (default) emits
    one whole-text shingle — right for dedup, where a short doc must still
    have a signature; ``"empty"`` emits no shingles — right for vocabulary
    mining, where a too-short text simply contributes nothing."""

    def _chain(toks: Column) -> Column:
        zipped = toks
        for k in range(1, n):
            zipped = F.zip_with(
                zipped, F.slice(toks, k + 1, 1 << 30),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        # trailing entries padded with nulls by zip_with produce short
        # shingles via concat_ws (null-skipping) — cut to the first
        # size-n+1 windows
        sh = F.slice(zipped, 1, F.greatest(F.size(toks) - (n - 1), F.lit(1)))
        fallback = (
            F.array(F.concat_ws(" ", toks))
            if short == "join"
            else F.array().cast("array<string>")
        )
        return F.array_distinct(
            F.when(F.size(toks) >= n, sh).otherwise(fallback)
        )

    return _bind(F.split(normalize_col(text), " "), _chain)


def minhash_values(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (array<string>[num_hashes]) of a bound shingle
    array: md5 number j = md5(j || '|' || shingle) yields FOUR 32-bit hash
    slices (8 hex chars each; lexicographic min == numeric min at fixed
    width), so only ceil(num_hashes/4) md5 evaluations per shingle. Zero
    shuffles — the naive explode + groupBy form costs a full shuffle of
    |docs|·|shingles| rows."""
    n_md5 = (num_hashes + 3) // 4

    # NB: per-j/per-k closures via factory functions — a two-parameter
    # lambda (even with a default) is read by F.transform as
    # (element, index)
    def _md5_fn(j: int):
        return lambda s: F.md5(F.concat(F.lit(f"{j}|"), s))

    def _slice_fn(k: int):
        return lambda x: F.substring(x, 8 * k + 1, 8)

    def _sig(sh: Column) -> Column:
        parts = []
        for j in range(n_md5):
            md5_arr = F.transform(sh, _md5_fn(j))
            # bind the md5 array once; 4 cheap substring passes over it
            parts.append(
                _bind(
                    md5_arr,
                    lambda m: F.array(
                        *[
                            F.array_min(F.transform(m, _slice_fn(k)))
                            for k in range(4)
                        ]
                    ),
                )
            )
        return F.slice(F.flatten(F.array(*parts)), 1, num_hashes)

    return _bind(shingles, _sig)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<string>[num_hashes]) — see :func:`minhash_values`."""
    return df.select(
        F.col(id_col),
        minhash_values(
            token_shingles(F.col(text_col), shingle_n), num_hashes
        ).alias("sig"),
    )


def lsh_candidates(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 4
) -> DataFrame:
    """Banded LSH: split the signature into ``bands`` slices; docs agreeing
    on any whole band become a candidate pair (a < b). The signature array
    is lambda-bound (:func:`_bind`) so projection collapse cannot inline
    the full signature computation into every band element.

    ``bands`` must divide the signature length — a zero-length band slice
    would hash md5('') for EVERY doc (full cross-product join) and a
    non-divisor silently drops trailing hashes. Enforced in-plan: the
    slice-width expression raises on the first row when bands does not
    divide the signature length (a detached guard column would be pruned);
    callers that know num_hashes also validate eagerly
    (see near_dup_pairs_minhash)."""

    def _bands(sig: Column) -> Column:
        # the slice width doubles as the divisibility guard: baked into
        # the expression Catalyst cannot prune it away (a detached
        # assert_true column would be column-pruned before evaluation)
        # size > 0 matters too: 0 % bands == 0, and a zero-length
        # signature would hash md5('') in EVERY band — all such rows
        # pairwise-join into exactly the cross-product blowup this
        # guard exists to prevent
        width = F.when(
            (F.size(sig) > 0) & (F.size(sig) % bands == 0),
            (F.size(sig) / bands).cast("int"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"bands ({bands}) must divide a non-empty "
                        "signature length, got "
                    ),
                    F.size(sig).cast("string"),
                )
            ).cast("int")
        )
        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.md5(
                    F.concat_ws("|", F.slice(sig, b * width + 1, width))
                ).alias("bh"),
            ),
        )

    if bands < 1:
        raise ValueError(f"bands must be >= 1, got {bands}")
    from ontology_mapping_spark.session import materialize

    # materialize the banded table before the self-join: its two sides are
    # rename-aliased, so exchange reuse never fires and the ENTIRE upstream
    # signature computation (4 md5 passes per shingle) would otherwise run
    # twice (measured 3.7s -> 2.7s on the sf0.1 row). |docs| x bands rows —
    # small relative to the corpus, the standard LSH build artifact.
    banded = materialize(
        sigs.select(
            id_col,
            F.explode(_bind(F.col("sig"), _bands)).alias("bb"),
        ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    )
    a = banded.select(F.col(id_col).alias("a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, verified with exact shingle
    Jaccard: (a, b, jaccard) with jaccard >= threshold."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}); "
            "zero-length or ragged band slices break the bucketing scheme"
        )
    # the shingle table feeds three plan branches (signatures + both
    # verification joins) — materialize it once or the corpus-wide
    # normalize + shingling runs three times (session.materialize: leak-
    # free by default, conf-switchable to reliable checkpoints for
    # clusters with executor churn).
    from ontology_mapping_spark.session import materialize

    sets_df = materialize(
        df.select(
            F.col(id_col), token_shingles(F.col(text_col), shingle_n).alias("sh")
        )
    )
    sigs = sets_df.select(
        id_col, minhash_values(F.col("sh"), num_hashes).alias("sig")
    )
    cands = lsh_candidates(sigs, id_col, bands)
    out = (
        cands.join(sets_df.select(F.col(id_col).alias("a"), F.col("sh").alias("sha")), "a")
        .join(sets_df.select(F.col(id_col).alias("b"), F.col("sh").alias("shb")), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sha", "shb"))
            / F.size(F.array_union("sha", "shb")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,  # (a, b) id pairs to score
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given id pairs (the verification kernel as a
    standalone op)."""
    sets_df = df.select(
        F.col(id_col), token_shingles(F.col(text_col), shingle_n).alias("sh")
    )
    return (
        pairs.join(sets_df.select(F.col(id_col).alias("a"), F.col("sh").alias("sha")), "a")
        .join(sets_df.select(F.col(id_col).alias("b"), F.col("sh").alias("shb")), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb"))
            ).alias("jaccard"),
        )
    )


def near_dup_pairs_embedding(
    corpus: DataFrame,
    threshold: float = 0.8,
    id_col: str = "id",
    vec_col: str = "vec",
    queries: DataFrame | None = None,
    dim: int | None = None,
    nbits: int = 8,
    tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs -> (a, b, cos), cos >= threshold.

    Two shapes:
    * ``queries`` given — brute-force probe: |queries| x |corpus| exact
      cosines (broadcast the probe side). Exact and SQL-reproducible;
      right when the probe side is small (incremental dedup of a new
      batch against the corpus).
    * corpus-scale — sign-LSH bucket blocking (similarity.sign_lsh_buckets)
      then exact cosine verification; never materializes n^2. Recall < 1
      by construction; raise ``tables``/lower ``nbits`` for higher recall.
    """
    from ontology_mapping_spark.functions.vectors import cosine_col, norm_col

    if queries is not None:
        # norms are precomputed per SIDE (|A| + |B| evaluations) instead of
        # per PAIR inside cosine_col (|A| x |B|) — the dot product is the
        # only per-pair array pass left
        a = queries.select(
            F.col(id_col).alias("a"),
            F.col(vec_col).alias("va"),
            norm_col(F.col(vec_col)).alias("na"),
        )
        b = corpus.select(
            F.col(id_col).alias("b"),
            F.col(vec_col).alias("vb"),
            norm_col(F.col(vec_col)).alias("nb"),
        )
        scored = b.crossJoin(F.broadcast(a)).filter(F.col("a") != F.col("b"))
        from ontology_mapping_spark.functions.vectors import dot_col

        out = (
            scored.withColumn(
                "cos",
                F.when(
                    (F.col("na") * F.col("nb")) > 0,
                    dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                ).otherwise(0.0),
            )
            .filter(F.col("cos") >= threshold)
            .select("a", "b", "cos")
        )
        # when the query batch OVERLAPS the corpus (incremental dedup
        # after the batch was appended), a pair whose two ids are each on
        # both sides comes out in both orientations; the drop-the-b-side
        # consumer pattern would then delete BOTH copies. The mirror of
        # (a, b) exists iff b is also a query id AND a is also a corpus
        # id — only then keep the canonical a < b orientation; every
        # other pair is kept as probed. Both membership frames are
        # query-sized (the probe-shape contract) — broadcast.
        qids = queries.select(
            F.col(id_col).alias("b"), F.lit(True).alias("__bq")
        ).distinct()
        q_in_corpus = (
            queries.select(F.col(id_col).alias("a"))
            .join(corpus.select(F.col(id_col).alias("a")), "a", "left_semi")
            .distinct()
            .withColumn("__ac", F.lit(True))
        )
        return (
            out.join(F.broadcast(qids), "b", "left")
            .join(F.broadcast(q_in_corpus), "a", "left")
            .filter(
                F.col("__bq").isNull()
                | F.col("__ac").isNull()
                | (F.col("a") < F.col("b"))
            )
            .select("a", "b", "cos")
        )
    else:
        from ontology_mapping_spark.operators.similarity import sign_lsh_buckets

        if dim is None:
            raise ValueError("dim is required for the LSH-blocked form")
        from ontology_mapping_spark.session import materialize

        # materialize the bucket table before its self-join: both sides
        # reference it, and the hyperplane dot products (nbits * tables
        # array folds per row — the expensive projection) would otherwise
        # run twice (same rule as the banded MinHash table above)
        bk = materialize(
            sign_lsh_buckets(
                corpus.select(
                    F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
                ),
                "id", dim, nbits, tables, seed,
            )
        )
        cands = (
            bk.select(F.col("id").alias("a"), "table", "bucket")
            .join(bk.select(F.col("id").alias("b"), "table", "bucket"), ["table", "bucket"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        scored = (
            cands.join(corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va")), "a")
            .join(corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb")), "b")
        )
    return (
        scored.withColumn("cos", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def simhash_bit(token: Column, bit: int) -> Column:
    """Deterministic bit ``bit`` (0..63) of the token hash: high bit of
    hex nibble ``bit`` of md5(token) for bits 0..31, and of md5('1|'+token)
    for bits 32..63 (one md5 yields only 32 nibbles) — reproducible in any
    engine that has md5 + substring."""
    if bit < 32:
        ch = F.substring(F.md5(token), bit + 1, 1)
    else:
        ch = F.substring(F.md5(F.concat(F.lit("1|"), token)), bit - 31, 1)
    return F.when(ch.isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """(id, simhash long): per-token ±1 votes per bit position, bit set when
    the vote sum is positive.

    Entirely within-row: ONE fold over the distinct-token array
    accumulates all ``bits`` vote sums in a struct — zero shuffle (the
    earlier explode + bits-wide groupBy paid a corpus-keyed exchange for
    a per-row computation). Every input row gets a signature: a document
    whose normalized text is empty or NULL votes nothing and fingerprints
    as 0 — dropping the row instead (the old shape: explode emits nothing
    to group) silently loses the document from any signature join."""
    if not 1 <= bits <= 63:
        # 63, not 64: bit 63 is the sign bit of the LongType value and
        # would change shiftright/ordering semantics for no dedup benefit
        raise ValueError(f"bits must be in 1..63, got {bits}")
    toks = F.filter(
        F.array_distinct(F.split(normalize_col(F.col(text_col)), " ")),
        lambda t: t != "",
    )

    def _fingerprint(votes: Column) -> Column:
        expr = F.lit(0).cast("long")
        for i in range(bits):
            expr = expr + F.when(votes[f"v{i}"] > 0, F.lit(1 << i)).otherwise(
                0
            ).cast("long")
        return expr

    def _sig(tk: Column) -> Column:
        votes = F.aggregate(
            tk,
            F.struct(*[F.lit(0).alias(f"v{i}") for i in range(bits)]),
            lambda acc, t: F.struct(
                *[(acc[f"v{i}"] + simhash_bit(t, i)).alias(f"v{i}") for i in range(bits)]
            ),
        )
        # bind the folded struct: _fingerprint references it 2*bits times
        return _bind(votes, _fingerprint)

    return df.select(
        F.col(id_col),
        # NULL text -> NULL token array -> NULL fold -> fingerprint 0
        F.coalesce(_bind(toks, _sig), F.lit(0).cast("long")).alias("simhash"),
    )


def near_dup_pairs_simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 2,
    band_bits: int = 4,
) -> DataFrame:
    """(a, b, hamming) with hamming <= max_hamming. Candidates share at
    least one ``band_bits``-wide band (pigeonhole: any pair within
    max_hamming agrees on >= 1 of bits/band_bits bands when
    bands > max_hamming); verified with bit_count(xor)."""
    if band_bits < 1 or bits % band_bits != 0:
        raise ValueError(
            f"band_bits ({band_bits}) must divide bits ({bits}); a ragged "
            "band would silently drop trailing bits from the bucketing"
        )
    n_bands = bits // band_bits
    if n_bands <= max_hamming:
        raise ValueError(
            f"bits/band_bits = {n_bands} bands must exceed max_hamming "
            f"({max_hamming}) or the pigeonhole guarantee breaks: a pair "
            "within threshold can differ in every band and is silently "
            "never a candidate — lower band_bits or max_hamming"
        )
    from ontology_mapping_spark.session import materialize

    # materialize the signature table before the banded self-join: its
    # two sides are rename-aliased, so exchange reuse never fires and the
    # full per-token vote fold would otherwise run twice over the corpus
    # (the same rule lsh_candidates documents for the MinHash table)
    sh = materialize(simhash(df, text_col, id_col, bits))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sh.select(
        id_col, "simhash", F.explode(band_structs).alias("bb")
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = banded.select(F.col(id_col).alias("a"), F.col("simhash").alias("ha"), "band", "key")
    b = banded.select(F.col(id_col).alias("b"), F.col("simhash").alias("hb"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kgram: int = 8,
    window: int = 4,
    min_shared: int = 3,
    max_fp_df: int | None = None,
) -> DataFrame:
    """Near-containment detection via winnow-fingerprint overlap — the
    application Schleimer et al. designed winnowing for (a document
    embedded in, or heavily quoting, another shares a guaranteed fraction
    of selected fingerprints even without being a global near-duplicate,
    which is why MinHash on whole-document shingle sets misses it).

    Returns (a, b, shared_fps, containment) for a < b with
    ``shared_fps >= min_shared``; containment = shared / min(|fps_a|,
    |fps_b|) in [0, 1] (1.0 = the smaller document's fingerprints all
    appear in the larger).

    Scale shape: flat (fp, doc) inverted index (winnowing already keeps
    ~2/window of the k-gram hashes, within-row, zero shuffle), optional
    ``max_fp_df`` cap dropping boilerplate fingerprints shared by more
    than that many docs (same df-cap move as the token blocking join —
    a fingerprint in half the corpus carries no containment signal and
    would fan out quadratically), fp equi-join + map-side-combined pair
    counts. Never n^2."""
    from ontology_mapping_spark.operators.textstats import winnow_fingerprints
    from ontology_mapping_spark.session import materialize

    # two join sides + the per-doc size table = three consumers
    fps = materialize(winnow_fingerprints(df, text_col, id_col, kgram, window))
    if max_fp_df:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_fp_df)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    sizes = fps.groupBy(id_col).agg(F.count("*").alias("n_fps"))
    a = fps.select(F.col(id_col).alias("a"), "fp")
    b = fps.select(F.col(id_col).alias("b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    return (
        shared.join(sizes.select(F.col(id_col).alias("a"), F.col("n_fps").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_fps").alias("nb")), "b")
        .select(
            "a",
            "b",
            "shared_fps",
            (F.col("shared_fps") / F.least("na", "nb")).alias("containment"),
        )
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-keyed dedup — the cheapest first-pass dedup at crawl scale:
    keep one row (min id) per :func:`canonical_url_col` key and expose the
    key as ``url_canon``. Hash-partition groupBy shape, same as
    :func:`exact_dedup` (one shuffle on the canonical key; no Python)."""
    from ontology_mapping_spark.functions.strings import canonical_url_col

    w = Window.partitionBy("url_canon").orderBy(F.col(id_col))
    return (
        df.withColumn("url_canon", canonical_url_col(F.col(url_col)))
        .withColumn("__rn", F.row_number().over(w))
        # NULL urls pass through (same rule as exact_dedup: a NULL window
        # key would fuse every url-less row into one keep-one group)
        .filter((F.col("__rn") == 1) | F.col(url_col).isNull())
        .drop("__rn")
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 10,
) -> DataFrame:
    """C4/RefinedWeb-style corpus-wide LINE dedup: each distinct line of at
    least ``min_chars`` chars (after trim) survives only in the globally
    first document/position it appears in ((id, pos)-min); shorter lines
    are exempt (always kept). Returns ``df`` with ``text_col`` rebuilt from
    the surviving lines plus ``n_lines_kept`` / ``n_lines_total``.

    Scale shape (the reason this is not a window over the line key): the
    winner per line is ``min(struct(id, pos))`` via groupBy — partial-agg
    (map-side combine) shrinks even a billion-row boilerplate key to one
    row per map task, where ``row_number`` over the same key would funnel
    the whole key through one reducer. The short-line exemption also
    removes the single hottest keys (empty lines, "Home", separators) from
    the shuffle entirely. The join back to the winners is 1:N on the line
    key with exactly one match per row — AQE skew-join splits any residual
    hot partition. Reassembly is one groupBy on ``id_col`` (collect_list
    of kept (pos, line) structs, array_sort, concat_ws), then one join on
    ``id_col`` to restore the untouched columns.
    """
    id_c, txt = F.col(id_col), F.col(text_col)
    lines = df.select(
        id_c,
        F.posexplode(F.split(txt, "\n")).alias("__pos", "__line"),
    ).withColumn(
        "__key",
        F.when(
            F.length(F.trim(F.col("__line"))) >= min_chars,
            F.md5(F.col("__line")),
        ),
    )
    winners = (
        lines.filter(F.col("__key").isNotNull())
        .groupBy("__key")
        .agg(F.min(F.struct(id_c.alias("d"), F.col("__pos").alias("p"))).alias("__w"))
    )
    kept = (
        lines.join(winners, "__key", "left")
        .withColumn(
            "__keep",
            F.col("__key").isNull()
            | ((F.col("__w.d") == id_c) & (F.col("__w.p") == F.col("__pos"))),
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("__pos"), F.col("__line")),
                        )
                    )
                ),
                lambda s: s["__line"],
            ),
        ).alias(text_col),
        F.sum(F.col("__keep").cast("long")).alias("n_lines_kept"),
        F.count(F.lit(1)).alias("n_lines_total"),
    )
    return df.drop(text_col).join(rebuilt, id_col)


def contaminated_doc_ids(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """ids of ``train`` docs sharing ANY n-token shingle with ``eval_df``
    (GPT-3/PaLM-style benchmark decontamination; 13-gram is the standard
    window). Shingles are keyed by md5 so the broadcast side is fixed-width
    and an external oracle can re-derive the key. Docs shorter than ``n``
    tokens contribute their whole text as one shingle (``short="join"``),
    so an exact copy of a short eval doc is still caught.

    Scale shape: the eval set is small by nature — its distinct gram keys
    BROADCAST, so the train side is one scan + map-side semi join (no
    shuffle of the corpus); only the matched doc ids (bounded by the
    contamination rate) hit a shuffle for the distinct."""
    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                token_shingles(F.col(text_col), n, short="join")
            ).alias("__g"),
        ).select(F.col(id_col), F.md5(F.col("__g")).alias("__gk"))

    ev = F.broadcast(grams(eval_df).select("__gk").distinct())
    return grams(train).join(ev, "__gk", "left_semi").select(id_col).distinct()


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Drop every ``train`` doc that shares an n-token shingle with the
    held-out ``eval_df`` (see :func:`contaminated_doc_ids`)."""
    bad = contaminated_doc_ids(
        train, eval_df, text_col=text_col, id_col=id_col, n=n
    )
    return train.join(bad, id_col, "left_anti")
