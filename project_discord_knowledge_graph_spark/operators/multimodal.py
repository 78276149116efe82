"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
typed metadata struct, exactly like the `html: binary` input column.
The Spark-side plumbing (schemas, batch shapes, mapInPandas
signatures, partition sizing) is real and tested; the actual codec
work is stubbed behind injectable decoders because no image/audio
library ships in this container — production injects a PIL/ffmpeg
batch function with the same signature.

Design rules encoded here:
- decode/feature-extract runs in mapInPandas so one Arrow batch of
  binary payloads is handled per Python call (never per-row);
- media batches are capped by bytes, not rows: a partition of 4K
  images at 1 MB each must not materialize as one 4 GB Arrow batch —
  `media_repartition` sizes partitions by payload bytes first.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),       # image|audio|video
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("feature", StringType(), True),
])


def media_repartition(df: DataFrame, target_bytes: int = 64 << 20,
                      payload_col: str = "payload") -> DataFrame:
    """Partition media rows by payload volume, not row count.

    Estimates total bytes from a cheap aggregate and repartitions so
    each partition carries ~target_bytes of payload — the knob that
    keeps Arrow batches and executor memory bounded when row sizes
    vary by 1000x (a thumbnail vs a video segment).
    """
    total = df.select(
        F.sum(F.coalesce(F.length(F.col(payload_col)), F.lit(0)))
    ).first()[0] or 0
    n = max(1, int(total / target_bytes) + 1)
    return df.repartition(n)


def default_stub_decoder(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decoder used by tests: 'decodes' a payload
    into its byte length and an md5-prefix pseudo-feature.  Replace
    with a real codec batch fn in production (same signature)."""
    import hashlib
    payloads = batch["payload"]
    return pd.DataFrame({
        "media_id": batch["media_id"],
        "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0)
                           .astype("int64"),
        "feature": payloads.map(
            lambda b: hashlib.md5(b or b"").hexdigest()[:12]),
    })


def decode_media(df: DataFrame,
                 decoder: Callable[[pd.DataFrame], pd.DataFrame] | None
                 = None,
                 require_real_codec: bool = False) -> DataFrame:
    """media table -> per-media feature rows via mapInPandas.

    `decoder` maps a pandas batch (media_id, payload columns) to a
    FEATURES_SCHEMA-shaped frame.  With require_real_codec=True and
    no decoder injected this raises NotImplementedError — the
    clearly-marked stub boundary (no codec libraries here).
    """
    if decoder is None:
        if require_real_codec:
            raise NotImplementedError(
                "no image/audio codec available in this environment; "
                "inject decoder(batch: pd.DataFrame) -> pd.DataFrame")
        decoder = default_stub_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield decoder(b)

    return (df.select("media_id", "payload")
            .mapInPandas(run, FEATURES_SCHEMA))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (native sequence/explode — the expensive frame decode
    itself happens in decode_media on the exploded rows)."""
    return (df.where(F.col("kind") == "video")
            .withColumn("frame_ts_ms", F.explode(
                F.sequence(F.lit(0),
                           F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms))))
            .select("media_id", "frame_ts_ms", "payload"))
