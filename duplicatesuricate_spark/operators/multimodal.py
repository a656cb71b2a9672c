"""Multimodal column plumbing (training-data pipeline requirement).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``.  The decode step itself is
STUBBED in this sandbox (no image/audio libraries in the container): the
default codec is a deterministic fake that derives features from the
payload bytes, and the real-codec hook raises ``NotImplementedError`` with
a clear message.  Everything Spark-side — schema, batching, partitioning,
UDF signatures — is real and tested; swapping in Pillow/ffmpeg later only
replaces the inner ``decode_fn``.

Schema:
    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]), True),
])

FEATURE_DIM = 16


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Hook for a real codec (Pillow / soundfile / ffmpeg).  Not available
    in this container — see module docstring."""
    raise NotImplementedError(
        "real media decoding requires image/audio libraries not present in "
        "this environment; use fake_decode (deterministic) or install a codec"
    )


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: a FEATURE_DIM float vector derived
    from the sha256 of the payload.  Stable across runs and executors."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.float64(2**32)).astype(np.float32)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = fake_decode,
) -> DataFrame:
    """media -> (media_id, kind, feature array<float>, payload_sha256).

    One Arrow batch at a time; the decode loop is per-row inside the batch
    because codecs are inherently per-payload, but all transfer is
    columnar and the output feature matrix is built once per batch."""
    out_schema = (
        "media_id long, kind string, payload_sha256 string, "
        f"feature array<float>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_fn(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload_sha256": [
                    hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                ],
                "feature": [f.tolist() for f in feats],
            })

    return media.mapInPandas(kernel, out_schema)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: which frame indexes to decode per video —
    pure Column math on metadata (the decode itself is the stubbed step).
    Emits one row per sampled frame index."""
    vids = media.where(F.col("kind") == "video").select(
        "media_id", F.col("meta.n_frames").alias("n_frames")
    )
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_frames") - 1, F.lit(0)),
        F.lit(every_n),
    )
    return vids.where(F.col("n_frames") > 0).select(
        "media_id", F.explode(idx).alias("frame_index")
    )


def synth_media(spark: SparkSession, n: int = 32, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": rng.randint(30, 300) if kind == "video" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
