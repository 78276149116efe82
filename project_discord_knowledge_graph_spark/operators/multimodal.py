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
                      payload_col: str = "payload",
                      id_col: str = "media_id") -> DataFrame:
    """Partition media rows by payload volume, not row count.

    Rows are keyed by (size_class, slot): size_class = floor(log2
    (payload bytes)) and each class spreads over ceil(class_bytes /
    target_bytes) slots, computed from one cheap per-class aggregate.
    Slot assignment is two-mode, bounding the worst case — not just
    the mean:

    - row-HEAVY classes (many rows per slot): hash slotting; equal-ish
      row sizes within a class (2x spread) + law of large numbers give
      tight per-slot concentration.
    - row-LIGHT classes (the huge-payload rows — few by definition):
      EXACT round-robin via row_number over a pruned (id, class)
      projection, broadcast-joined back, so k rows over s slots load
      each slot with at most ceil(k/s) rows ~ target + one max row.
      The window never moves payload bytes, and the projection is
      small precisely because these classes are row-light.

    Final placement is repartitionByRange on the key, so distinct
    slots map to distinct partitions (hash placement could stack two
    slots).  The HARD per-decoder-call byte bound is additionally
    enforced downstream by decode_media's batch slicer.
    """
    from pyspark.sql import Window

    nbytes = F.coalesce(F.length(F.col(payload_col)), F.lit(0))
    cls = F.floor(F.log2(F.greatest(nbytes, F.lit(1)).cast("double")))
    per_class = (df.groupBy(cls.alias("_cls"))
                 .agg(F.sum(nbytes).alias("b"),
                      F.count("*").alias("n")).collect())
    slots = {int(r._cls): max(1, int(r.b / target_bytes) + 1)
             for r in per_class}
    if not slots:
        return df.repartition(1)
    n_total = sum(slots.values())
    slots_map = F.create_map(*[F.lit(x) for kv in slots.items()
                               for x in kv])
    slot_count = F.element_at(slots_map, cls.cast("int"))
    # exact round-robin only for genuinely row-LIGHT classes: few rows
    # per slot AND few rows absolutely — the per-class window sort and
    # the broadcast of the assignment frame must both stay tiny.  A
    # uniformly-huge corpus (n ~ 32*slots but millions of rows) is
    # row-dense enough for hash slotting's concentration anyway.
    _LIGHT_MAX_ROWS = 65_536
    light = [int(r._cls) for r in per_class
             if r.n < min(32 * slots[int(r._cls)], _LIGHT_MAX_ROWS)]

    out_cols = df.columns
    keyed = df.withColumn("_cls", cls.cast("int"))
    if light:
        # one assignment row per DISTINCT id (dropDuplicates) so the
        # join back can never change the row multiset — duplicate-id
        # rows simply share a slot
        proj = (keyed.where(F.col("_cls").isin(light))
                .select(F.col(id_col).alias("_mid"), "_cls")
                .dropDuplicates(["_mid"]))
        w = Window.partitionBy("_cls").orderBy(F.xxhash64("_mid"))
        assign = proj.select(
            "_mid",
            F.pmod(F.row_number().over(w) - 1,
                   F.element_at(slots_map, F.col("_cls")))
             .alias("_aslot"))
        keyed = keyed.join(F.broadcast(assign),
                           keyed[id_col] == assign["_mid"], "left") \
                     .drop("_mid")
    else:
        keyed = keyed.withColumn("_aslot", F.lit(None).cast("long"))
    slot = F.coalesce(
        F.col("_aslot"),
        F.pmod(F.xxhash64(F.col(id_col)), slot_count))
    return (keyed.withColumn("_slot", slot)
            .repartitionByRange(n_total, "_cls", "_slot")
            .select(*out_cols))


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


def slice_batch_by_bytes(batch: pd.DataFrame, max_bytes: int,
                         payload_col: str = "payload"
                         ) -> Iterator[pd.DataFrame]:
    """Split one pandas batch into sub-batches whose payload byte sums
    stay <= max_bytes (a single oversized row goes alone) — the HARD
    worst-case bound on decoder peak memory, independent of how rows
    happened to land in partitions/Arrow batches upstream."""
    sizes = batch[payload_col].map(
        lambda b: len(b) if b is not None else 0)
    start, acc = 0, 0
    for i, sz in enumerate(sizes):
        if i > start and acc + sz > max_bytes:
            yield batch.iloc[start:i]
            start, acc = i, 0
        acc += sz
    if start < len(batch):
        yield batch.iloc[start:]


def decode_media(df: DataFrame,
                 decoder: Callable[[pd.DataFrame], pd.DataFrame] | None
                 = None,
                 require_real_codec: bool = False,
                 max_batch_bytes: int = 64 << 20) -> DataFrame:
    """media table -> per-media feature rows via mapInPandas.

    `decoder` maps a pandas batch (media_id, payload columns) to a
    FEATURES_SCHEMA-shaped frame.  Each incoming Arrow batch is
    re-sliced by cumulative payload bytes (slice_batch_by_bytes), so
    no decoder call ever sees more than max_batch_bytes of payload —
    Spark's arrow.maxRecordsPerBatch caps ROWS, which is meaningless
    when row sizes vary 1000x.  With require_real_codec=True and
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
            for sub in slice_batch_by_bytes(b, max_batch_bytes):
                yield decoder(sub)

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
