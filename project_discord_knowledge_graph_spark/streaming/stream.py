"""Structured Streaming surface.

The reference is batch with scheduled incremental ingest (daily cron
dispatch, AFTER_TS cursor, landing folders with completion markers —
entrypoint.sh:8-83, export.yml:3-30).  The Spark-native equivalent:

- `stream_pages` — file-source readStream over the pages directory;
  new parquet files are the arriving crawl slices.  The AFTER_TS
  cursor becomes the stream's own exactly-once file tracking.
- `streaming_triples` — the full rule path per micro-batch via
  foreachBatch (the Q&A link joins are segment-local self-joins, so
  running them inside each micro-batch reproduces the reference's
  per-export-file behavior; triples land partitioned by batch with
  idempotent overwrite).
- `hourly_type_counts` — the W4 tumbling hour window as a real
  streaming windowed aggregate with a watermark for late data.
- `session_counts` — session_window(ts, '5 minutes'): the 5-minute
  gap heuristic the reference documents but never implemented
  (README.md:41-45; preprocessor.py:188's unused
  max_time_gap_minutes) — here it exists for real.

Trigger.AvailableNow covers the reference's cron-batch cadence:
process everything that has landed, checkpoint, stop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.classify import with_type
from ..sources.pages import pages_to_messages
from ..sources.synth import PAGES_SCHEMA


def stream_pages(spark: SparkSession, path: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(path)


def streaming_triples(pages_stream: DataFrame, out_path: str,
                      checkpoint: str, available_now: bool = True):
    """pages stream -> triples table, exactly-once per micro-batch."""
    from ..plans.pipeline import build_triples

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        (build_triples(batch_df)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite").partitionBy("batch_id")
         .parquet(out_path))

    writer = (pages_stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_discord_exports(spark: SparkSession, path: str,
                           max_files_per_trigger: int | None = None
                           ) -> DataFrame:
    """S1 as a stream: channel-export JSON files landing in a folder
    (the reference's daily export drop, entrypoint.sh:8-83) become a
    file-source stream with the explicit export schema — each arriving
    file is one channel export, flattened to preprocessed messages."""
    from ..sources.discord_export import EXPORT_SCHEMA, export_to_messages
    reader = spark.readStream.schema(EXPORT_SCHEMA) \
        .option("multiLine", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return export_to_messages(reader.json(path))


def streaming_export_triples(messages_stream: DataFrame, out_path: str,
                             checkpoint: str,
                             available_now: bool = True):
    """Flattened export-message stream -> triples, exactly-once per
    micro-batch (classify + extract + link + dedup inside
    foreachBatch, same as the pages path)."""
    from ..operators.classify import with_type
    from ..operators.dedup import aggregate_triples
    from ..operators.extract import extract_triples
    from ..operators.link import link_qa

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        msgs = with_type(batch_df)
        triples = aggregate_triples(extract_triples(msgs), link_qa(msgs))
        (triples.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite").partitionBy("batch_id")
         .parquet(out_path))

    writer = (messages_stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_type_counts(pages_stream: DataFrame,
                       watermark: str = "2 hours") -> DataFrame:
    """W4 hour buckets as a streaming windowed aggregate: counts of
    classified message types per tumbling hour of warc_ts."""
    msgs = with_type(pages_to_messages(pages_stream))
    return (msgs
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", "1 hour").alias("hour"), "type")
            .agg(F.count("*").alias("n"))
            .select(F.col("hour.start").alias("hour_start"), "type", "n"))


def session_counts(pages_stream: DataFrame, gap: str = "5 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """The reference's documented-but-unimplemented 5-minute-gap
    segmentation, as a real session_window aggregate per author."""
    msgs = pages_to_messages(pages_stream)
    return (msgs
            .withWatermark("warc_ts", watermark)
            .groupBy(F.session_window("warc_ts", gap).alias("sess"),
                     "author")
            .agg(F.count("*").alias("n_messages"))
            .select("author", F.col("sess.start").alias("session_start"),
                    F.col("sess.end").alias("session_end"), "n_messages"))


def run_available_now(stream_df: DataFrame, out_path: str,
                      checkpoint: str, output_mode: str = "append"):
    """Drain everything currently landed into a parquet sink."""
    return (stream_df.writeStream
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out_path)
            .start())
