"""S1: the Discord channel-export JSON source + full P1 flatten.

The reference's primary input is a nested channel-export JSON file
(DiscordChatExporter shape): `{"guild": {...}, "channel": {...},
"messages": [...]}` loaded at preprocessor.py:252-283 and flattened
message-by-message into the 20-field `PreprocessedMessage`
(preprocessor.py:15-39) by `preserve_metadata` / `process_message`
(preprocessor.py:47-96, 213-250).

Spark-first shape: `spark.read.json` with an explicit schema (no
sampling pass over 100 TB of exports), `explode(messages)`, then one
narrow projection implementing every `.get`-default rule natively:

- author_roles    <- author.roles[].name, '' for missing names
                     (preprocessor.py:52-57)
- mentions        <- mentions[].name falling back to .id then ''
                     (preprocessor.py:60-65)
- attachments     <- [{filename <- fileName, url, size <-
                     fileSizeBytes (0 default)}] (preprocessor.py:68-75)
- reactions       <- [{emoji <- emoji.name, count (0 default)}]
                     (preprocessor.py:78-84)
- is_bot          <- author.isBot default false (preprocessor.py:93)
- is_pinned       <- isPinned default false (preprocessor.py:94)
- reply_to        <- reference.messageId, null-safe
                     (preprocessor.py:95)
- thread          <- thread.name if thread present, else
                     'thread-'||reference.channelId when the reference
                     carries a channelId (extract_thread_name,
                     preprocessor.py:168-185)
- timestamp       <- P2 normalization (functions/timestamps.py);
                     original_timestamp preserves the raw string
- segment_id      <- thread slug, else md5(channel-author-hourwindow)
                     where the hour window reads the RAW string's
                     wall-clock fields (generate_segment_id parses
                     without tz conversion, preprocessor.py:140-166)
- type/confidence <- 'alert'/0.5 process_message defaults
                     (preprocessor.py:213-215); the classifier stage
                     overwrites them downstream
- clean_text      <- P3 pandas UDF (byte parity, functions/cleaning.py)

Schema note: the reference tolerates malformed exports where roles /
mentions are bare strings instead of objects (the `str(...)` branches
at preprocessor.py:54-57, 64-65).  A fixed columnar schema represents
the well-formed export shape; malformed-variant files should be
routed through read_jsonl + a mapInPandas repair pass instead of
weakening every scan's schema.

Documented deviation (explicit null vs missing key): a columnar
schema cannot distinguish `"name": null` from an absent key, so
explicit-null fields take the same defaults as missing ones.  The
reference's dict.get() would instead surface the None (producing
artifacts like a 'thread-None' segment when `"channelId": null`);
real exports omit keys rather than null them, and the default-on-null
behavior is the saner of the two for the ones that don't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, StringType, StructField, StructType,
)

from ..functions.cleaning import clean_text_udf
from ..functions.timestamps import iso_utc_expr, parse_timestamp_expr

_ROLE = StructType([StructField("id", StringType()),
                    StructField("name", StringType())])
_MENTION = StructType([StructField("id", StringType()),
                       StructField("name", StringType())])
_ATTACHMENT = StructType([StructField("fileName", StringType()),
                          StructField("url", StringType()),
                          StructField("fileSizeBytes", LongType())])
_REACTION = StructType([
    StructField("emoji", StructType([StructField("name", StringType())])),
    StructField("count", LongType())])
_REFERENCE = StructType([StructField("messageId", StringType()),
                         StructField("channelId", StringType())])

EXPORT_MESSAGE_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("timestamp", StringType()),
    StructField("content", StringType()),
    StructField("isPinned", BooleanType()),
    # standard exports carry no per-message channel; kept in the
    # schema because the reference's segment grouping reads it
    # (preprocessor.py:196) with an 'unknown' default
    StructField("channel", StructType([StructField("name",
                                                   StringType())])),
    StructField("author", StructType([
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("isBot", BooleanType()),
        StructField("roles", ArrayType(_ROLE)),
    ])),
    StructField("mentions", ArrayType(_MENTION)),
    StructField("attachments", ArrayType(_ATTACHMENT)),
    StructField("reactions", ArrayType(_REACTION)),
    StructField("reference", _REFERENCE),
    StructField("thread", StructType([StructField("name", StringType())])),
])

EXPORT_SCHEMA = StructType([
    StructField("guild", StructType([StructField("id", StringType()),
                                     StructField("name", StringType())])),
    StructField("channel", StructType([
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("category", StringType())])),
    StructField("messages", ArrayType(EXPORT_MESSAGE_SCHEMA)),
])

ATTACHMENT_OUT = "array<struct<filename:string,url:string,size:bigint>>"
REACTION_OUT = "array<struct<emoji:string,count:bigint>>"


def read_discord_export(spark: SparkSession, path: str) -> DataFrame:
    """One channel-export JSON document per file (multiLine) with the
    explicit export schema — no schema-inference sampling pass."""
    return spark.read.json(path, multiLine=True, schema=EXPORT_SCHEMA)


def repair_export_message(m: dict) -> dict:
    """Normalize one malformed export message IN the export shape
    (preprocessor.py:47-96 tolerant branches):

    - bare-string/number roles    -> {"name": str(role)}
    - bare-string/number mentions -> {"name": str(mention)}
    - non-dict attachments        -> dropped (reference has no else)
    - non-dict reactions          -> dropped

    Dict elements pass through untouched, so the downstream columnar
    flatten (flatten_message_cols) reproduces the reference's .get
    defaults on them exactly as for well-formed exports."""
    author = m.get("author")
    if isinstance(author, dict):
        roles = author.get("roles")
        if isinstance(roles, list):
            author["roles"] = [
                r if isinstance(r, dict) else {"name": str(r)}
                for r in roles]
    mentions = m.get("mentions")
    if isinstance(mentions, list):
        m["mentions"] = [x if isinstance(x, dict) else {"name": str(x)}
                         for x in mentions]
    for key in ("attachments", "reactions"):
        arr = m.get(key)
        if isinstance(arr, list):
            m[key] = [x for x in arr if isinstance(x, dict)]
    return m


def repair_exports(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Malformed-export repair pass: JSON document strings -> parsed
    export rows (EXPORT_SCHEMA).

    One Arrow-batched mapInPandas hop doing json.loads + the
    repair_export_message normalization + json.dumps, then a native
    from_json with the strict columnar schema.  This keeps the
    malformed-variant tolerance OUT of every well-formed scan (the
    fixed schema stays strict; see the schema note above) — only
    files routed through this repair door pay the Python pass.
    Unparseable documents yield no rows (PERMISSIVE-equivalent).

    The loads/dumps round trip is the measured cost of the pass, so
    it runs on orjson when available with a per-document stdlib
    fallback — orjson is stricter than stdlib (rejects NaN/Infinity
    literals and >64-bit ints), and the fallback keeps those
    documents on the exact old path, so the accepted-document set
    and emitted bytes' parsed values are unchanged (from_json reads
    the serialized form; key order and float shortest-repr are
    preserved by both encoders)."""
    import json

    import pandas as pd

    try:
        import orjson as _oj
    except ImportError:
        _oj = None

    def _loads(s):
        if _oj is not None:
            try:
                return _oj.loads(s)
            except Exception:
                pass  # stricter parser: retry with stdlib below
        return json.loads(s)

    def _dumps(doc):
        if _oj is not None:
            try:
                return _oj.dumps(doc).decode("utf-8")
            except Exception:
                pass  # e.g. ints beyond 64-bit: stdlib handles
        return json.dumps(doc)

    def fix(batches):
        for pdf in batches:
            out = []
            for s in pdf[value_col]:
                try:
                    doc = _loads(s)
                except (ValueError, TypeError):
                    continue
                if isinstance(doc, dict):
                    for m in doc.get("messages") or []:
                        if isinstance(m, dict):
                            repair_export_message(m)
                    out.append(_dumps(doc))
            yield pd.DataFrame({"value": out})

    return (raw.mapInPandas(fix, "value string")
            .select(F.from_json("value", EXPORT_SCHEMA).alias("e"))
            .select("e.*"))


def read_discord_export_repaired(spark: SparkSession,
                                 path: str) -> DataFrame:
    """The repair front door: whole-file read (one export document per
    file, matching read_discord_export's multiLine unit) -> repair ->
    strict-schema parse.  Feed the result to export_to_messages."""
    return repair_exports(spark.read.text(path, wholetext=True))


def _empty(arr_type: str) -> Column:
    return F.array().cast(arr_type)


# fromisoformat's padded shape, anchored: the positional slices below
# are only meaningful when the string starts exactly 'yyyy-mm-dd' and,
# if a time follows, with a 2-digit hour.  Spark's parser is more
# lenient (leading whitespace, unpadded fields) — those strings must
# fall to 'unknown' like the reference, not be sliced blindly.
_ISO_PREFIX = r"^\d{4}-\d{2}-\d{2}([T ]\d{2}(:|$)|$)"


def hour_window_expr(raw: Column) -> Column:
    """generate_segment_id's time window (preprocessor.py:153-158):
    the RAW string's wall-clock date+hour as 'yyyyMMdd-HH' (strftime
    on the fromisoformat result keeps the written zone's wall clock),
    'unknown' when the string doesn't parse.

    Validity gate = strict padded-ISO prefix regex AND a successful
    parse (calendar-range check): Spark's lenient parser alone would
    accept forms fromisoformat rejects (leading space, single-digit
    fields) and the positional slices would emit garbage windows.
    Residual documented divergence: compact ISO ('20240102T030405'),
    which fromisoformat accepts but lands on 'unknown' here."""
    date8 = F.regexp_replace(F.substring(raw, 1, 10), "-", "")
    hh = F.when(F.length(raw) >= 13, F.substring(raw, 12, 2)) \
          .otherwise(F.lit("00"))
    ok = raw.rlike(_ISO_PREFIX) & parse_timestamp_expr(raw).isNotNull()
    return F.when(ok, F.concat(date8, F.lit("-"), hh)) \
            .otherwise(F.lit("unknown"))


def thread_slug_expr(thread: Column) -> Column:
    """'thread-' + lowercase non-alnum->'-' (preprocessor.py:144-147)."""
    return F.concat(
        F.lit("thread-"),
        F.regexp_replace(F.lower(thread), "[^a-zA-Z0-9]", "-"))


def segment_id_expr(thread: Column, channel: Column, author: Column,
                    raw_ts: Column) -> Column:
    """preprocessor.py:140-166 — native md5 matches hashlib.md5.
    An EMPTY thread name is falsy in the reference (`if thread_name:`)
    and must fall through to the hash branch, same as null."""
    key = F.concat_ws("-", channel, author, hour_window_expr(raw_ts))
    return F.when(thread.isNotNull() & (thread != ""),
                  thread_slug_expr(thread)) \
            .otherwise(F.concat(F.lit("segment-"),
                                F.substring(F.md5(key), 1, 8)))


def flatten_message_cols(m: Column, channel: Column) -> dict[str, Column]:
    """The 20 PreprocessedMessage fields as native expressions over a
    parsed export-message struct (schema EXPORT_MESSAGE_SCHEMA)."""
    author = F.coalesce(m["author"]["name"], F.lit("unknown"))
    raw_ts = F.coalesce(m["timestamp"], F.lit(""))
    content = F.coalesce(m["content"], F.lit(""))
    thread = F.when(
        m["thread"].isNotNull(), m["thread"]["name"]
    ).otherwise(
        F.when(m["reference"]["channelId"].isNotNull(),
               F.concat(F.lit("thread-"), m["reference"]["channelId"])))

    roles = F.when(
        m["author"]["roles"].isNotNull(),
        F.transform(m["author"]["roles"],
                    lambda r: F.coalesce(r["name"], F.lit("")))
    ).otherwise(_empty("array<string>"))

    mentions = F.when(
        m["mentions"].isNotNull(),
        F.transform(m["mentions"],
                    lambda x: F.coalesce(x["name"], x["id"], F.lit("")))
    ).otherwise(_empty("array<string>"))

    attachments = F.when(
        m["attachments"].isNotNull(),
        F.transform(m["attachments"], lambda a: F.struct(
            F.coalesce(a["fileName"], F.lit("")).alias("filename"),
            F.coalesce(a["url"], F.lit("")).alias("url"),
            F.coalesce(a["fileSizeBytes"], F.lit(0)).alias("size")))
    ).otherwise(_empty(ATTACHMENT_OUT))

    reactions = F.when(
        m["reactions"].isNotNull(),
        F.transform(m["reactions"], lambda r: F.struct(
            F.coalesce(r["emoji"]["name"], F.lit("")).alias("emoji"),
            F.coalesce(r["count"], F.lit(0)).alias("count")))
    ).otherwise(_empty(REACTION_OUT))

    ts = parse_timestamp_expr(raw_ts)
    # the reference hashes the MESSAGE-level channel name into the
    # segment key ('unknown' for standard exports) while the channel
    # column carries the export's top-level name — see schema note
    seg_channel = F.coalesce(m["channel"]["name"], F.lit("unknown"))
    return {
        "message_id": F.coalesce(m["id"], F.lit("")),
        "segment_id": segment_id_expr(thread, seg_channel, author,
                                      raw_ts),
        "thread": thread,
        "channel": channel,
        "author": author,
        "timestamp": iso_utc_expr(ts),
        "warc_ts": ts,
        "type": F.lit("alert"),
        "confidence": F.lit(0.5),
        "content": content,
        "clean_text": clean_text_udf(content),
        "original_timestamp": raw_ts,
        "author_id": F.coalesce(m["author"]["id"], F.lit("")),
        "author_roles": roles,
        "mentions": mentions,
        "attachments": attachments,
        "reactions": reactions,
        "is_bot": F.coalesce(m["author"]["isBot"], F.lit(False)),
        "is_pinned": F.coalesce(m["isPinned"], F.lit(False)),
        "reply_to": m["reference"]["messageId"],
    }


def export_to_messages(exports: DataFrame,
                       drop_empty: bool = True) -> DataFrame:
    """Channel exports -> one preprocessed-message row per message.

    One narrow stage: explode + native projections (the P3 cleaner is
    the only Python, Arrow-batched).  Empty-content rows are dropped
    exactly as preprocessor.py:272-274 (content.strip() == '').
    """
    base = exports.select(
        F.coalesce(F.col("channel.name"), F.lit("unknown"))
         .alias("channel"),
        F.explode("messages").alias("m"))
    cols = flatten_message_cols(F.col("m"), F.col("channel"))
    out = base.select(*[c.alias(k) for k, c in cols.items()])
    if drop_empty:
        # content.strip() == '' in Python strips ALL whitespace (tabs,
        # newlines, NBSP) — Spark's trim() strips only ' ', so use a
        # unicode-aware all-whitespace regex instead
        out = out.where(~F.col("content").rlike(r"^(?U)\s*$"))
    return out


def message_flag_stats(messages: DataFrame) -> DataFrame:
    """A4 extension (print_stats, preprocessor.py:298-312): global
    distinct/flag counts over preprocessed messages, one pass."""
    return messages.agg(
        F.count("*").alias("total_messages"),
        F.countDistinct("segment_id").alias("unique_segments"),
        F.countDistinct("author").alias("unique_authors"),
        F.count(F.when(F.col("thread").isNotNull(), 1))
         .alias("with_threads"),
        F.count(F.when(F.col("is_bot"), 1)).alias("bot_messages"),
        F.count(F.when(F.col("is_pinned"), 1)).alias("pinned_messages"),
        F.count(F.when(F.size("attachments") > 0, 1))
         .alias("with_attachments"),
        F.sum(F.aggregate("reactions", F.lit(0).cast("bigint"),
                          lambda acc, r: acc + r["count"]))
         .alias("total_reactions"),
    )
