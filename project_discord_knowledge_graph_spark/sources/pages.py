"""Pages-table source and the pages -> messages derivation stage.

Input contract (BASELINE input_hint): a table of Common-Crawl-style
web pages `(url string, warc_ts timestamp, html binary, text string,
lang string)`.  At production scale this is an Iceberg table
partitioned by days(warc_ts) — incremental runs prune partitions by
watermark (the reference's AFTER_TS cursor, entrypoint.sh:12-15);
locally parquet stands in and the same predicate pushes down to the
scan (visible as PushedFilters in .explain).

`pages_to_messages` re-expresses the reference preprocessor
(preprocessor.py:47-296) as one narrow projection stage: metadata
flatten (P1), timestamp normalize (P2), clean_text (P3, pandas UDF),
empty filter (P5), thread extraction (P9) and segment-id derivation
(preprocessor.py:140-166, md5 hour-bucket — native md5 matches
hashlib.md5 byte-for-byte).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.cleaning import parse_page_udf
from ..functions.html import extract_text_udf
from ..functions.timestamps import iso_utc_expr


def read_pages(spark: SparkSession, path: str,
               after_ts: str | None = None) -> DataFrame:
    """Scan the pages table; `after_ts` is the incremental watermark
    (partition-pruned at the source)."""
    df = spark.read.parquet(path)
    if after_ts is not None:
        df = df.where(F.col("warc_ts") > F.lit(after_ts).cast("timestamp"))
    return df


def pages_to_messages(pages: DataFrame,
                      include_content: bool = False,
                      classify: bool = False) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> preprocessed messages.

    Text extraction + P3 cleaning + metadata parse run fused in ONE
    Arrow-batched pandas UDF (the whole downstream rule path consumes
    `clean_text` only — the reference reads msg['clean_text'] in
    every extractor).  One narrow stage: no shuffle, html pruned
    immediately after use, single pass over each page's bytes.

    P5 empty filter: the reference drops content.strip() == ''
    (preprocessor.py:272-274).  P3 cleaning maps a string to '' iff
    the input was whitespace-only (lower/collapse/strip never empty a
    non-blank string, markup rewrites only substitute), so filtering
    on clean_text == '' is equivalent and saves materializing the raw
    content column.  Pass include_content=True to also keep the
    uncleaned extracted text.
    """
    df = pages.withColumn("_p", parse_page_udf(F.col("html")))
    if include_content:
        df = df.withColumn("content", extract_text_udf(F.col("html")))

    empty_as_null = lambda c: F.when(c == "", None).otherwise(c)  # noqa: E731

    df = df.select(
        "url",
        "warc_ts",
        "lang",
        F.col("_p.clean_text").alias("clean_text"),
        *(["content"] if include_content else []),
        F.col("_p.message_id").alias("message_id"),
        F.col("_p.author").alias("author"),
        F.col("_p.channel").alias("channel"),
        empty_as_null(F.col("_p.thread")).alias("thread"),
        empty_as_null(F.col("_p.thread_slug")).alias("_thread_slug"),
        empty_as_null(F.col("_p.reply_to")).alias("reply_to"),
        F.when(F.col("_p.mentions_csv") == "",
               F.array().cast("array<string>"))
         .otherwise(F.split(F.col("_p.mentions_csv"), ","))
         .alias("mentions"),
        *([F.col("_p.type").alias("_type")] if classify else []),
    )

    # P2 timestamp normalize: typed ts + the ISO string the reference
    # emits (keep both; string avoids reformat drift, SURVEY section 7).
    # iso_utc_expr preserves microseconds when present, matching
    # datetime.isoformat() — the string round-trips the typed value.
    df = df.withColumn("timestamp", iso_utc_expr(F.col("warc_ts")))

    # P5 empty filter (see docstring)
    df = df.where(F.col("clean_text") != "")

    # segment id (preprocessor.py:140-166).  The thread slug arrives
    # precomputed from the parse UDF (the reference's own Python
    # re.sub — see parse_page_udf): thread is null iff the slug is,
    # and the JVM RegExpReplace it replaces measured ~0.9 s/2M pages.
    hour_bucket = F.date_format("warc_ts", "yyyyMMdd-HH")
    hashed = F.md5(F.concat_ws("-", F.col("channel"), F.col("author"),
                               hour_bucket))
    df = df.withColumn(
        "segment_id",
        F.when(F.col("thread").isNotNull(), F.col("_thread_slug"))
         .otherwise(F.concat(F.lit("segment-"), F.substring(hashed, 1, 8))))
    if classify:
        # C1 classification fused into the parse UDF (same Python pass
        # that cleaned the text — see functions/cleaning.py
        # _classify_lowered).  Repositioned to the end so the schema
        # matches with_type(pages_to_messages(...)) exactly; the
        # coalesce fallback can never fire (the UDF always returns a
        # string) — it only restores with_type's non-nullable bit.
        df = df.withColumn(
            "type", F.coalesce(F.col("_type"), F.lit("discussion"))
        ).drop("_type")
    return df.drop("_thread_slug")
