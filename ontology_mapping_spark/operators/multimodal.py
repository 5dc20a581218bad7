"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` operators. Image decode (:func:`decode_image_real`,
``decoder="pillow"``) is implemented behind an optional Pillow import —
absent in this container it raises ``NotImplementedError`` with the
integration note and its test skips cleanly. The default decoder remains
a clearly-marked deterministic fake (md5-seeded feature vector, exactly
reproducible in SQL) so the Spark-side plumbing — schema, partitioning,
UDF signature, batch shape — is real, oracle-verified, and fully tested
with no image library present.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)


def decode_image_real(payload: bytes):
    """Real image decode behind an optional Pillow import (the same seam
    pattern as the spaCy embedder in functions/vectors.py): returns an
    RGB float32 ndarray (H, W, 3) scaled to [0, 1]. On hosts without
    Pillow this raises ``NotImplementedError`` with the integration note —
    the deterministic fake below exercises the identical Spark plumbing
    and remains the oracle default."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - exercised lib-less
        raise NotImplementedError(
            "image decoding requires Pillow, not present in this "
            "container; the deterministic fake exercises the identical "
            "Spark plumbing (install Pillow on the executor image to "
            "activate this path — no other change needed)"
        ) from exc
    import io

    import numpy as np

    with Image.open(io.BytesIO(bytes(payload))) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def real_image_feature(payload: bytes | None, dim: int = 16) -> list[float]:
    """Pillow-backed decode -> pooled-pixel feature: the image is decoded,
    average-pooled onto a fixed grid of ``dim`` cells (row-major over a
    near-square grid), and each cell's mean intensity becomes one lane.
    Deterministic for a given payload; same signature/batch shape as
    :func:`fake_feature`, so the two decoders are drop-in swaps."""
    if payload is None:
        return [0.0] * dim
    import numpy as np

    arr = decode_image_real(payload).mean(axis=2)  # (H, W) intensity
    rows = max(int(dim**0.5), 1)
    cols = (dim + rows - 1) // rows
    h, w = arr.shape
    out: list[float] = []
    for j in range(dim):
        r, c = divmod(j, cols)
        rs, re = (h * r) // rows, max((h * (r + 1)) // rows, (h * r) // rows + 1)
        cs, ce = (w * c) // cols, max((w * (c + 1)) // cols, (w * c) // cols + 1)
        cell = arr[min(rs, h - 1) : min(re, h), min(cs, w - 1) : min(ce, w)]
        out.append(float(cell.mean()) if cell.size else 0.0)
    return out


def fake_feature(payload: bytes | None, dim: int = 16) -> list[float]:
    """DETERMINISTIC FAKE decode+embed standing in for
    decode->resize->model.forward (same signature, same batch shape).

    Lane ``j`` is the integer value of a 4-hex-char slice of a salted md5
    of the payload (digest ``j // 8``, slice ``j % 8``) — every value is an
    integer in [0, 65535], exactly representable in float32, so a SQL
    oracle can reproduce the feature bit-exactly (same md5-slice scheme as
    the MinHash lanes in operators/dedup.py)."""
    if payload is None:
        return [0.0] * dim
    out: list[float] = []
    hexes: dict[int, str] = {}
    for j in range(dim):
        d, sl = divmod(j, 8)
        if d not in hexes:
            hexes[d] = hashlib.md5(b"%d|" % d + bytes(payload)).hexdigest()
        out.append(float(int(hexes[d][4 * sl : 4 * sl + 4], 16)))
    return out


def extract_media_features(
    media: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """binary payload -> feature vector, one Arrow batch at a time.

    ``decoder``: "fake" (deterministic md5 lanes — the SQL-reproducible
    oracle default) or "pillow" (:func:`real_image_feature`; requires
    Pillow on the executors, raising ``NotImplementedError`` per batch
    otherwise)."""
    kernels = {"fake": fake_feature, "pillow": real_image_feature}
    if decoder not in kernels:
        raise ValueError(
            f"unknown decoder {decoder!r}; accepted values: {sorted(kernels)}"
        )
    kernel = kernels[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            ).astype({"n_bytes": "int32"})

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_idx, ts_ms) rows per
    video from metadata (payload decode is the stubbed kernel). One input
    row fans out to <= max_frames rows — the schema/partitioning shape a
    real decoder would fill."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.least(
                        F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms,
                        F.lit(max_frames - 1),
                    ).cast("int"),
                )
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )
