"""ANN similarity search + text-stat operators + multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ontology_mapping_spark.operators.multimodal import (
    decode_image_real,
    extract_media_features,
    sample_video_frames,
)
from ontology_mapping_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk_bruteforce,
)
from ontology_mapping_spark.operators.textstats import (
    detect_lang,
    fingerprint,
    quality_score,
    regex_token_count,
    whitespace_token_count,
    winnow_fingerprints,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


def _np_topk(vecs: dict[int, np.ndarray], q_ids: list[int], k: int):
    ids = sorted(vecs)
    M = np.stack([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
    out = {}
    for q in q_ids:
        qv = vecs[q] / np.linalg.norm(vecs[q])
        cos = M @ qv
        order = sorted(zip(-cos, ids))  # desc cos, asc id tie-break
        out[q] = [i for _, i in order[:k]]
    return out


def test_bruteforce_topk_matches_numpy(spark, emb):
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    q_ids = [0, 7, 42]
    queries = emb.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec"))
    got = cosine_topk_bruteforce(queries, corpus, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["q_id"], r["rank"])):
        by_q.setdefault(r["q_id"], []).append(r["c_id"])
    want = _np_topk(vecs, q_ids, 5)
    assert by_q == {q: want[q] for q in q_ids}


def test_ann_lsh_recall_and_consistency(spark, emb):
    q_ids = list(range(10))
    queries = emb.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec"))
    exact = cosine_topk_bruteforce(queries, corpus, k=10)
    approx = ann_lsh_topk(queries, corpus, dim=64, k=10, nbits=4, tables=8)
    e = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # approximate by design; deterministic seed


def test_ann_ivf_recall(spark, emb):
    q_ids = list(range(10))
    queries = emb.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec"))
    exact = cosine_topk_bruteforce(queries, corpus, k=10)
    approx = ann_ivf_topk(queries, corpus, k=10, n_centroids=8, nprobe=4)
    e = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("Hello, world! 42 times",), ("",), ("  spaced   out  ",)], "t string"
    )
    rows = df.select(
        whitespace_token_count(F.col("t")).alias("ws"),
        regex_token_count(F.col("t")).alias("rx"),
    ).collect()
    assert [r["ws"] for r in rows] == [4, 0, 2]
    # hello , world ! 42 times -> 6 regex tokens
    assert rows[0]["rx"] == 6


def test_detect_lang_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is warm",),
            ("der hund ist nicht in der wohnung und das ist gut",),
            ("le chat est dans la maison et il est content",),
            ("el perro es un animal y la casa es grande",),
        ],
        "t string",
    )
    got = [r["lang"] for r in df.select(detect_lang(F.col("t")).alias("lang")).collect()]
    assert got == ["en", "de", "fr", "es"]


def test_quality_score_orders_prose_above_noise(spark):
    df = spark.createDataFrame(
        [
            ("prose", "the quick brown fox jumps over the lazy dog and it is fine"),
            ("noise", "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))"),
        ],
        "k string, t string",
    )
    got = {r["k"]: r["q"] for r in df.select("k", quality_score(F.col("t")).alias("q")).collect()}
    assert 0.0 <= got["noise"] < got["prose"] <= 1.0


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [("a", "Hello   World"), ("b", "hello world"), ("c", "other text")],
        "k string, t string",
    )
    got = {r["k"]: r["fp"] for r in df.select("k", fingerprint(F.col("t")).alias("fp")).collect()}
    assert got["a"] == got["b"] != got["c"]


def test_winnow_containment(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base + " lambda mu nu xi omicron"), (2, base), (3, "wholly different words here")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    overlap12 = len(by_doc[1] & by_doc[2]) / len(by_doc[2])
    overlap13 = len(by_doc[1] & by_doc[3]) / len(by_doc[3])
    assert overlap12 > 0.5
    assert overlap13 == 0.0


def test_multimodal_plumbing(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNGfake"), ("image/png", 4, 4, None)),
        ("m2", "video", bytearray(b"\x00\x00vid"), ("video/mp4", 16, 9, 3500)),
        ("m3", "image", None, ("image/png", 1, 1, None)),
    ]
    from ontology_mapping_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_media_features(media, dim=8).collect()}
    assert len(feats["m1"]["feature"]) == 8
    assert feats["m3"]["n_bytes"] == 0
    # determinism
    again = {r["media_id"]: r for r in extract_media_features(media, dim=8).collect()}
    assert feats["m1"]["feature"] == again["m1"]["feature"]
    frames = sample_video_frames(media, every_ms=1000, max_frames=8).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in frames} == {
        ("m2", 0), ("m2", 1), ("m2", 2), ("m2", 3)
    }
    try:
        import PIL  # noqa: F401
    except ImportError:
        # lib-less host: the real-decode seam must fail loudly with the
        # integration note, not with a bare ImportError mid-task
        with pytest.raises(NotImplementedError):
            decode_image_real(b"x")


def _tiny_png(px):
    """Minimal in-memory PNG via Pillow (callers importorskip first)."""
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(px, dtype="uint8")).save(buf, format="PNG")
    return buf.getvalue()


def test_pillow_decode_seam(spark):
    # exercised only where Pillow ships; skips cleanly in this container
    pytest.importorskip("PIL")
    import numpy as np

    from ontology_mapping_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        real_image_feature,
    )

    px = np.zeros((8, 8, 3), dtype="uint8")
    px[:4] = 255  # top half white, bottom black
    payload = _tiny_png(px)
    arr = decode_image_real(payload)
    assert arr.shape == (8, 8, 3) and arr.max() <= 1.0
    feat = real_image_feature(payload, dim=4)
    assert len(feat) == 4 and feat[0] > 0.9 and feat[3] < 0.1
    rows = [("p1", "image", bytearray(payload), ("image/png", 8, 8, None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = extract_media_features(media, dim=4, decoder="pillow").collect()
    assert [round(v, 5) for v in got[0]["feature"]] == [
        round(v, 5) for v in feat
    ]


def test_frequent_phrase_mentions_forms_agree(spark):
    from ontology_mapping_spark.operators.textstats import frequent_phrase_mentions

    rows = [(i, "alpha beta gamma delta" if i % 2 else "alpha beta unique%d" % i)
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    agg = frequent_phrase_mentions(docs, n=2, min_df=5)
    win = frequent_phrase_mentions(docs, n=2, min_df=5, form="window")
    a = {(r["doc_id"], r["phrase"]) for r in agg.collect()}
    w = {(r["doc_id"], r["phrase"]) for r in win.collect()}
    assert a == w and a  # same hits, non-empty
    assert ("alpha beta") in {p for _, p in a}  # df=20 phrase survives
    import pytest
    with pytest.raises(ValueError):
        frequent_phrase_mentions(docs, form="nope")


def test_repetition_stats_gopher_rules(spark):
    from ontology_mapping_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat again"),
            (2, "click here click here click here"),
            (3, "one"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["n_tokens"] == 10 and rows[1]["top_bigram_count"] == 2
    assert rows[2]["top_bigram_count"] == 3 and rows[2]["top_bigram_frac"] == 0.6
    assert rows[2]["distinct_token_frac"] == 0.333333
    assert rows[3]["top_bigram_count"] == 0 and rows[3]["distinct_token_frac"] == 1.0
    assert rows[4]["n_tokens"] == 0 and rows[5]["n_tokens"] == 0


def test_scrub_pii_twins_agree(spark):
    """Catalyst scrub_pii_cols == pure-Python twin on texts covering every
    PII class, ordering interactions, and false-positive guards."""
    from pyspark.sql import functions as F

    from ontology_mapping_spark.functions.strings import scrub_pii_cols, scrub_pii_py

    texts = [
        "mail a.b-c_d%e+f@sub.domain.co.uk now",
        "server at 192.168.0.1 and 10.0.0.255, call +14155551234",
        "no pii here, just 1.2 version and price +99",
        "user5@example2.org from 10.1.44.8 dial +4915123456789",
        "double x@y.io z@w.ai and 1.1.1.1 2.2.2.2",
        "version 1.2.3.4.5 is not an ip? boundary check 999.999.999.999",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    cols = scrub_pii_cols(F.col("t"))
    rows = df.select(
        "t",
        cols["clean_text"].alias("c"),
        cols["n_email"].alias("ne"),
        cols["n_ip"].alias("ni"),
        cols["n_phone"].alias("np"),
    ).collect()
    for r in rows:
        want_c, want_n = scrub_pii_py(r["t"])
        assert r["c"] == want_c, (r["t"], r["c"], want_c)
        assert (r["ne"], r["ni"], r["np"]) == (
            want_n["n_email"],
            want_n["n_ip"],
            want_n["n_phone"],
        ), r["t"]


def test_corpus_filter_verdicts(spark):
    """Each threshold knob independently flips its target document."""
    from ontology_mapping_spark.operators.textstats import corpus_filter

    good = (
        "the quick brown fox jumps over the lazy dog and then the calm cat "
        "walks along the wide road toward a small town near the old river"
    )
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "short text"),                      # under min_tokens
            (3, ("spam ham " * 30).strip()),        # repetitious bigram
            (4, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18"),  # no alpha
            (5, ("uno dos tres cuatro cinco seis siete ocho nueve diez "
                 "once doce trece catorce quince")),  # no en stopwords
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in corpus_filter(docs).collect()}
    assert got[1] is True
    assert got[2] is False and got[3] is False
    assert got[4] is False and got[5] is False


def test_token_counts_null_text_is_zero(spark):
    """NULL text counts as 0 tokens (not NULL): a NULL count turns every
    threshold predicate three-valued and rows vanish from both the kept
    and the complement set."""
    from ontology_mapping_spark.operators.textstats import (
        regex_token_count,
        whitespace_token_count,
    )

    df = spark.createDataFrame(
        [(1, "two words"), (2, None), (3, "")], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["w"], r["b"])
        for r in df.select(
            "doc_id",
            whitespace_token_count(F.col("text")).alias("w"),
            regex_token_count(F.col("text")).alias("b"),
        ).collect()
    }
    assert got == {1: (2, 2), 2: (0, 0), 3: (0, 0)}
    # keep + reject partitions the corpus even with NULL rows present
    kept = df.filter(whitespace_token_count(F.col("text")) >= 1).count()
    rejected = df.filter(whitespace_token_count(F.col("text")) < 1).count()
    assert kept + rejected == df.count()


def test_sign_lsh_dim_mismatch_raises(spark):
    """A wrong caller-supplied dim must fail loudly: NULL hyperplane dots
    would put ALL vectors in one bucket per table, silently collapsing
    the candidate join to the full cross product."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from ontology_mapping_spark.operators.similarity import sign_lsh_buckets

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "id int, vec array<float>"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        sign_lsh_buckets(corpus, "id", 9999).collect()
    # a NULL vector keeps the legacy all-zero bucket (no error)
    withnull = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)], "id int, vec array<float>"
    )
    got = {
        (r["id"], r["table"]): r["bucket"]
        for r in sign_lsh_buckets(withnull, "id", 2, nbits=2, tables=1).collect()
    }
    assert got[(2, 0)] == "00"
