"""WARC source: the Common-Crawl-native front door.

The engine's canonical input is the pages table
`(url, warc_ts, html, text, lang)` (BASELINE input_hint; Iceberg at
scale, parquet locally).  Real Common-Crawl data lands as WARC files
(ISO 28500: `WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<payload>\\r\\n\\r\\n`
records) — this module turns a directory of WARC files into that
pages table with zero per-row Python anywhere on the path:

- record SPLITTING is the text datasource with a multi-character
  record delimiter (`spark.read.option("lineSep", "WARC/1.0\\r\\n")`)
  — entirely JVM-side (HadoopFileLinesReader with custom delimiter
  bytes), splittable for plain files, streamed, no whole-file reads;
- header PARSING is native Catalyst (`regexp_extract` for
  WARC-Target-URI / WARC-Date / Content-Type / Content-Length, a
  split on the first blank line for the payload) — whole-stage-
  codegen'd, no UDF.

Compression: `.warc.gz` / `.wet.gz` with one gzip member per record
(Common Crawl's actual layout — concatenated members are a valid
multi-member gzip stream) decompress transparently through Hadoop's
multi-member GzipCodec; gzipped files are NOT splittable, so
parallelism there is per-file — exactly right for Common Crawl's
~64k × ~1 GiB segment files (tested: tests/test_warc.py gz fixture).

Scope honestly stated:
- payloads are decoded/re-encoded utf-8 (the text datasource decodes
  bytes); Content-Length therefore verifies only for valid-UTF-8
  payloads — binary-exact non-UTF-8 payloads are out of scope.
- delimiter framing assumes `WARC/1.0\\r\\n` never appears INSIDE a
  payload.  Real crawled HTML can contain those bytes; when it does
  the record splits mid-payload.  The reader HONORS Content-Length
  as a TRUNCATION guard: a split record's payload comes up SHORT of
  its declared length and is quarantined (dropped by default,
  `on_length_mismatch="keep"` to inspect), and a headerless tail
  fragment fails the WARC-Type filter.  (Short-only, not equality:
  non-UTF-8 payloads re-encode LONGER, see _length_ok — equality
  would silently drop intact pages.)  KNOWN RESIDUAL VECTOR
  (round-6 advice): the guard stops truncation, not injection — a
  crawled payload that EMBEDS a complete well-formed WARC record
  splits the real record (quarantined as short) while the embedded
  record parses with valid headers and a self-consistent
  Content-Length, so attacker-chosen url/html rows from forged
  embedded records CAN flow downstream.  Trust-boundary note for
  operators: treat rows from untrusted crawls accordingly; a
  delimiter-in-declared-length quarantine (or Content-Length-driven
  framing) closes it at the cost of a second pass and is the
  documented follow-up, deliberately not landed in the
  result-frozen optimization round.
- HTTP header strip prefers the first CRLFCRLF anywhere in the
  payload over the bare-LF fallback (see read_warc): a lenient
  bare-LF-header response whose BODY contains \\r\\n\\r\\n is
  split at the body occurrence and loses its prefix — documented
  divergence, same follow-up round as above (split at the earliest
  of the two separators).
- `application/http` payloads (real CC response records wrap the
  HTTP response) have the HTTP status line + headers stripped
  natively, so `html` is the document alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_DELIM = "WARC/1.0\r\n"
_BLANK = "\r\n\r\n"


def _records(spark: SparkSession, path: str) -> DataFrame:
    """Directory of WARC-framed files -> one parsed row per record:
    (_type, url, warc_ts, _ctype, _clen, _payload) — the one
    splitting + framing implementation both read_warc and read_wet
    build on.  All-JVM: text scan with multi-char lineSep + Catalyst
    header expressions (no PythonRDD / BatchEvalPython node — plan
    asserted in tests/test_warc.py)."""
    records = (spark.read.option("lineSep", _DELIM).text(path)
               .withColumnRenamed("value", "record")
               .where(F.length(F.trim("record")) > 0))
    header = F.substring_index("record", _BLANK, 1)
    # payload = everything after the first blank line, minus the
    # record's trailing \r\n\r\n separator
    payload = F.regexp_replace(
        F.expr("substring(record, length(substring_index(record, "
               "'\\r\\n\\r\\n', 1)) + 5)"),
        "\r\n\r\n$", "")

    def h(name: str):
        return F.nullif(
            F.regexp_extract(header, rf"(?m)^{name}:\s*(\S+)", 1),
            F.lit(""))

    return records.select(
        h("WARC-Type").alias("_type"),
        h("WARC-Target-URI").alias("url"),
        F.to_timestamp(h("WARC-Date")).alias("warc_ts"),
        h("Content-Type").alias("_ctype"),
        h("Content-Length").cast("long").alias("_clen"),
        payload.alias("_payload"))


def _length_ok():
    """Truncation guard: a delimiter-split record's payload is
    strictly SHORTER than its declared Content-Length, so quarantine
    only payloads with fewer utf-8 bytes than declared (NULL
    declared = ok).  Deliberately NOT an equality check: a non-UTF-8
    payload (latin-1 page, binary HTTP body) re-encodes to >= its
    original byte count (invalid sequences widen to U+FFFD), and
    dropping those intact records would be silent data loss — they
    pass the guard and flow on with the documented utf-8-decode
    mangling instead."""
    return (F.col("_clen").isNull()
            | (F.octet_length("_payload") >= F.col("_clen")))


def _apply_length_policy(df: DataFrame,
                         on_length_mismatch: str) -> DataFrame:
    if on_length_mismatch == "drop":
        return df.where(_length_ok())
    if on_length_mismatch == "keep":
        return df
    raise ValueError(
        f"on_length_mismatch must be 'drop' or 'keep', "
        f"got {on_length_mismatch!r}")


def read_warc(spark: SparkSession, path: str,
              on_length_mismatch: str = "drop") -> DataFrame:
    """WARC directory -> pages table
    (url, warc_ts timestamp, html binary, text string, lang string).

    Only `WARC-Type: response` records become pages (warcinfo /
    request / metadata records are dropped).  Records whose payload
    fails the declared Content-Length (mid-payload split or
    truncation) are quarantined per `on_length_mismatch` — see the
    module docstring.  `application/http` payloads (how Common Crawl
    actually wraps responses) get the HTTP status line + header
    block stripped so `html` is the document alone.

    `text` is NULL — the pipeline's own extractor
    (pages_to_messages) derives it from html, which keeps the
    byte-identical-text-per-url contract in ONE place instead of
    trusting upstream WET text.  `lang` is NULL for the same reason.
    """
    rec = _apply_length_policy(
        _records(spark, path).where(F.col("_type") == "response"),
        on_length_mismatch)
    is_http = F.coalesce(F.col("_ctype").contains("application/http"),
                         F.lit(False))
    # the HTTP header block ends at the first blank line — CRLF per
    # RFC, but lenient servers emit bare-LF headers, so fall back to
    # "\n\n" before concluding the payload is headers-only
    body = (F.when(is_http & (F.instr("_payload", _BLANK) > 0),
                   F.expr("substring(_payload, instr(_payload, "
                          "'\\r\\n\\r\\n') + 4)"))
            .when(is_http & (F.instr("_payload", "\n\n") > 0),
                   F.expr("substring(_payload, instr(_payload, "
                          "'\\n\\n') + 2)"))
            .when(is_http, F.lit(""))   # headers-only HTTP payload
            .otherwise(F.col("_payload")))
    return rec.select(
        "url", "warc_ts",
        F.encode(body, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"))


def write_warc(pages: DataFrame, path: str,
               compression: str | None = None) -> None:
    """pages table -> WARC files (one record per page), written
    distributed: each partition becomes one .warc file via the same
    native expressions read_warc parses.  Test/bench scaffolding for
    the round-trip contract AND a valid interchange export."""
    rec = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.concat(F.lit("WARC-Target-URI: "), F.col("url"),
                 F.lit("\r\n")),
        F.concat(F.lit("WARC-Date: "),
                 # microsecond precision (WARC 1.1 allows fractional
                 # seconds) so the timestamp round-trips exactly
                 F.date_format(F.col("warc_ts").cast("timestamp_ltz"),
                               "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
                 F.lit("\r\n")),
        F.lit("Content-Type: text/html\r\n"),
        F.concat(F.lit("Content-Length: "),
                 F.length(F.col("html")).cast("string"),
                 F.lit("\r\n")),
        F.lit("\r\n"),
        F.decode(F.col("html"), "utf-8"))
    # the record separator is the writer's lineSep (an empty lineSep
    # is rejected), so each row writes as
    # "WARC/1.0\r\n<headers>\r\n\r\n<payload>\r\n\r\n" byte-exactly
    w = (pages.select(rec.alias("value"))
         .write.mode("overwrite").option("lineSep", "\r\n\r\n"))
    if compression:
        # e.g. 'gzip' -> .warc-shaped .gz files the reader's codec
        # path consumes (whole-file member; per-file parallelism)
        w = w.option("compression", compression)
    w.text(path)


def read_wet(spark: SparkSession, path: str,
             on_length_mismatch: str = "drop") -> DataFrame:
    """WET directory (Common Crawl's text extracts: same ISO-28500
    framing, `WARC-Type: conversion`, text payload) -> document table
    (url, warc_ts, text, n_chars).  `.wet.gz` (per-record gzip
    members) reads through the same path — see module docstring.

    WET records carry NO html and no page <meta> fields, so they
    cannot feed the message pipeline (message_id/author/channel come
    from the page markup — pages_to_messages would drop every row);
    their home is the corpus-curation family: exact/near dedup, text
    metrics, language ID over `text` (operators/dataset.py,
    functions/textmetrics.py take id/text column names).
    """
    rec = _apply_length_policy(
        _records(spark, path).where(F.col("_type") == "conversion"),
        on_length_mismatch)
    return rec.select(
        "url", "warc_ts",
        F.col("_payload").alias("text"),
        F.length("_payload").cast("long").alias("n_chars"))


def write_wet(docs: DataFrame, path: str,
              url_col: str = "url", ts_col: str = "warc_ts",
              text_col: str = "text",
              compression: str | None = None) -> None:
    """documents -> WET files (conversion records), distributed."""
    rec = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: conversion\r\n"),
        F.concat(F.lit("WARC-Target-URI: "), F.col(url_col),
                 F.lit("\r\n")),
        F.concat(F.lit("WARC-Date: "),
                 F.date_format(F.col(ts_col).cast("timestamp_ltz"),
                               "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
                 F.lit("\r\n")),
        F.lit("Content-Type: text/plain\r\n"),
        F.concat(F.lit("Content-Length: "),
                 F.octet_length(F.col(text_col)).cast("string"),
                 F.lit("\r\n")),
        F.lit("\r\n"),
        F.col(text_col))
    w = (docs.select(rec.alias("value"))
         .write.mode("overwrite").option("lineSep", "\r\n\r\n"))
    if compression:
        w = w.option("compression", compression)
    w.text(path)
