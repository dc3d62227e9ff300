"""Multimodal columns: binary payloads + typed metadata, Spark-side real.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark plumbing — schema, partition-aware batch
iteration, Arrow batch shapes, UDF signatures — is real and tested; the
actual codec work (JPEG decode, resampling) is STUBBED because no media
libraries exist in this container:

- ``decode_media(..., fake=True)`` produces a deterministic fake feature
  vector (a pure function of the payload bytes) so pipelines and tests
  run end-to-end;
- ``decode_media(..., fake=False)`` raises NotImplementedError inside
  the executor batch loop — the marked integration point where a real
  decoder (PIL/ffmpeg/torchaudio) drops in, one Arrow batch at a time.

At 100 TB the payload column dominates I/O: keep media in its own table
keyed by content hash, repartition by that key before mapInPandas so a
decode task never holds more than ``maxRecordsPerBatch`` payloads, and
project metadata-only reads off the parquet scan (column pruning keeps
the binary column unread — verified via .explain ReadSchema).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), True),  # owning document
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
                    T.StructField("sha256", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"

FEATURE_DIM = 8


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes, real schema)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 4)
        kind = kinds[i % 3]
        rows.append(
            (
                i,
                i % 17,
                kind,
                bytearray(payload),
                (
                    {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    64 + (i % 8) * 16 if kind != "audio" else None,
                    64 + (i % 5) * 16 if kind != "audio" else None,
                    1000 * (1 + i % 30) if kind != "image" else None,
                    hashlib.sha256(payload).hexdigest(),
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real feature extractor: dim floats
    derived from the payload digest (pure function of bytes)."""
    d = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(d[: dim * 4], dtype=np.uint32).astype(np.float64)
    return (raw / np.float64(2**32)).astype(np.float32)


def decode_media(media: DataFrame, fake: bool = True, dim: int = FEATURE_DIM) -> DataFrame:
    """payload → feature vector, one Arrow batch at a time (mapInPandas).

    The batch loop, schemas and partitioning are production-shaped; only
    the innermost transform is stubbed (see module docstring).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container; "
                    "plug the codec in here (one pandas batch of payloads at a time)"
                )
            payloads = pdf["payload"]
            feats = [fake_feature(b if b is not None else b"", dim) for b in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype(
                        "int32"
                    ),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → (media_id, frame_idx, t_ms) sampling plan — pure Column
    sequence explode; the decode of each planned frame goes through the
    same stubbed mapInPandas integration point."""
    v = media.where(F.col("kind") == "video")
    n_frames = F.greatest(F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int"))
    return v.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_i"),
    ).select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("t_ms"))


def metadata_profile(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never touches the payload column, so the
    parquet scan prunes it (ReadSchema excludes `payload`)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("meta.duration_ms"), 2).alias("avg_duration_ms"),
            F.max("meta.width").alias("max_width"),
        )
        .orderBy("kind")
    )
