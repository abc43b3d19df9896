"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns plus typed
metadata — the same convention as the ``pages.html`` column. The Spark-side
machinery (schemas, Arrow batch shapes, partitioning, UDF signatures) is
real and tested; the *codec* step is stubbed (this container ships no
image/audio libraries): ``decode_image`` raises ``NotImplementedError``
unless a deterministic fake decoder is requested, which derives a stable
pseudo-"image" from the bytes so downstream feature extraction is testable
end-to-end.

All Python work happens in Arrow-batched ``mapInPandas`` iterators —
batch-at-a-time, zero per-row Python dispatch — per the input_hint's
vectorized-UDF mandate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, height int"
)

FEATURE_SCHEMA = "media_id long, n_bytes int, fp_md5 string, feature array<float>"

FEATURE_DIM = 16


def decode_image(payload: bytes, fake: bool = False) -> "np.ndarray":
    """Decode image bytes to an HxWx3 uint8 array.

    STUB: real decoding requires an image library not present in this
    container. ``fake=True`` returns a deterministic 8x8x3 array derived
    from the payload digest, so the full pipeline (decode → resize →
    featurize) can be exercised and tested.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec library (e.g. Pillow); "
            "not available in this environment — use fake=True for the "
            "deterministic test decoder"
        )
    digest = hashlib.sha256(payload).digest()
    rng = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return rng.reshape(8, 8, 3).copy()


def _featurize_batch(pdf: pd.DataFrame, fake_decode: bool) -> pd.DataFrame:
    payloads = pdf["payload"]
    n_bytes = payloads.map(lambda b: len(b) if b is not None else 0).astype("int32")
    fp_md5 = payloads.map(
        lambda b: hashlib.md5(bytes(b or b"")).hexdigest()
    )
    feats = []
    for b in payloads:
        img = decode_image(bytes(b or b""), fake=fake_decode)
        digest = hashlib.sha256(bytes(b or b"")).digest()
        # channel-wise block means + leading digest bytes, each scaled by a
        # power of two — every component is a dyadic rational, EXACTLY
        # representable in both float32 and float64, so an external SQL
        # oracle (the driver's DuckDB gate) reproduces the values
        # bit-for-bit. A real codec plugs in at decode_image; the contract
        # (array<float> of FEATURE_DIM, deterministic per payload) stays.
        means = img.reshape(-1, 3).mean(axis=0) / 256.0  # sums of 64 uint8 → exact
        rest = np.frombuffer(digest[: FEATURE_DIM - 3], dtype=np.uint8) / 256.0
        f = np.concatenate([means, rest])[:FEATURE_DIM]
        feats.append(f.astype("float32").tolist())
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "n_bytes": n_bytes,
            "fp_md5": fp_md5,
            "feature": feats,
        }
    )


def extract_features(
    media: DataFrame, fake_decode: bool = True, batch_partitions: int | None = None
) -> DataFrame:
    """media(media_id, payload, ...) → FEATURE_SCHEMA rows via mapInPandas.

    ``batch_partitions`` repartitions first so feature extraction (the
    expensive step in a real pipeline) spreads evenly across executors
    regardless of source file layout.
    """
    src = media.select("media_id", "payload")
    if batch_partitions:
        src = src.repartition(batch_partitions, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _featurize_batch(pdf, fake_decode)

    return src.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (payload = bytes of a seeded pattern),
    JVM-side generation — the multimodal analogue of sources.pages."""
    return (
        spark.range(0, n)
        .select(
            F.col("id").alias("media_id"),
            F.lit(kind).alias("kind"),
            F.encode(
                F.concat(F.lit("media-payload-"), F.col("id"), F.lit("-"), F.md5(F.col("id").cast("string").cast("binary"))),
                "utf-8",
            ).alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
        )
    )
