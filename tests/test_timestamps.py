"""P2 dirty-timestamp normalizer: parity vs the reference port and
round-trip invariants (microsecond preservation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_discord_knowledge_graph_spark.functions.timestamps import (
    iso_utc_expr, normalize_timestamps, quarantine_split,
)
from project_discord_knowledge_graph_spark.oracle import reference_port as RP

FIXTURES = [
    "2024-01-02T03:04:05Z",
    "2024-01-02T03:04:05.123456Z",
    "2024-01-02T03:04:05+05:30",
    "2024-01-02T03:04:05.500000-04:00",
    "2024-01-02T03:04:05",            # tz-naive -> assume UTC
    "2024-01-02 03:04:05.000001",     # space separator, 1 us
    "2024-02-29T23:59:59.999999Z",    # leap day, max micros
    "garbage",
    "",
]


def test_normalize_parity_vs_reference(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(FIXTURES)], ["i", "raw"])
    out = normalize_timestamps(df, "raw")
    got = {r.i: (r.timestamp_iso, r.raw_valid) for r in out.collect()}
    for i, s in enumerate(FIXTURES):
        want = RP.normalize_timestamp(s)
        assert got[i] == (want, want is not None), (s, got[i], want)


def test_quarantine_split(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(FIXTURES)], ["i", "raw"])
    clean, quarantined = quarantine_split(df, "raw")
    assert clean.count() == 7
    assert {r.raw for r in quarantined.collect()} == {"garbage", ""}


def test_iso_string_roundtrips_typed_value(spark):
    # the emitted ISO string must parse back to the exact same instant
    # (microsecond-precise) — the ADVICE round-trip requirement
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .limit(200)
          .select(F.col("ts").cast("timestamp_ltz").alias("t")))
    back = ev.select(
        "t", F.to_timestamp(iso_utc_expr(F.col("t"))).alias("t2"))
    assert back.where(F.col("t") != F.col("t2")).count() == 0
