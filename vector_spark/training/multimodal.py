"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, batch iteration, partition sizing) is
real and tested; the codec kernels are deterministic fakes/stubs because
the image/audio libraries are not in this container — swap `_decode_*`
for PIL/torchaudio/ffmpeg calls in production. Everything flows through
mapInPandas so decode happens Arrow-batch-at-a-time with bounded memory
(maxRecordsPerBatch), never row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (stands in for real image/audio blobs)."""
    i = F.col("id")
    payload = F.encode(
        F.concat(F.lit("blob:"), F.sha2(F.concat(i.cast("string"), F.lit(seed)), 256)), "utf-8"
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(i, F.lit(3)) + 1).cast("int")
    )
    return spark.range(n).select(
        F.format_string("m-%09d", i).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64(i, F.lit("w")), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64(i, F.lit("h")), F.lit(1080)) + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64(i, F.lit("f")), F.lit(300)) + 1).cast("int").alias("n_frames"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake decode → 8-dim feature. PRODUCTION: replace
    with a real decoder; raise NotImplementedError to fail loudly if a
    real decode is demanded."""
    import hashlib

    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via mapInPandas: the production shape for
    CPU-heavy per-blob work. Each Arrow batch is decoded in one Python
    call; partitioning upstream controls batch memory (keep payloads
    ≲ maxPartitionBytes/4 so a batch of blobs fits comfortably)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"], strict=True)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling plumbing: expand n_frames into sampled frame
    indexes (the real decoder would seek these). Pure expression."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
