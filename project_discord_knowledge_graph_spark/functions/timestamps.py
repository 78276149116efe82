"""P2: dirty-timestamp normalization as a native Spark operator.

Reproduces the reference's normalize_timestamp
(preprocessor.py:98-117) semantics over raw ISO-ish strings:

- 'Z' suffix -> UTC (Spark's parser accepts the literal Z);
- explicit offset -> converted to the UTC instant;
- tz-naive -> assumed UTC (the session timezone is pinned to UTC in
  session.py, so the naive parse lands on the same instant);
- unparseable / empty -> **null + quarantine count** instead of the
  reference's nondeterministic `datetime.now()` fallback (documented
  deviation, SURVEY.md section 7: a data-dependent wall-clock read is
  not reproducible and would poison incremental watermarks).

The emitted ISO string matches Python `datetime.isoformat()` on the
UTC-normalized value: 'yyyy-MM-ddTHH:mm:ss[.ffffff]+00:00' with the
6-digit fractional part present only when the microseconds are
non-zero — so the string round-trips the typed value at full
precision (J2 window math is microsecond-exact).

All expressions are native (try_to_timestamp + date_format): the hot
path stays inside whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def iso_utc_expr(ts: Column) -> Column:
    """timestamp -> Python-isoformat-parity UTC string.

    Microseconds are emitted as exactly six digits iff non-zero,
    mirroring datetime.isoformat() (preprocessor.py:114).

    One date_format per row (pattern chosen by the micros test)
    instead of date_format + lpad + three concats: the string
    allocations were measured at ~22% of the whole pages->messages
    stage at 2M rows, and this is the narrow hot path.
    """
    micros = F.pmod(F.unix_micros(ts), F.lit(1_000_000))
    return F.when(
        micros != 0,
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")
    ).otherwise(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ssxxx"))


def parse_timestamp_expr(raw: Column) -> Column:
    """Dirty string -> typed UTC timestamp (null when unparseable).

    try_to_timestamp with the session parser covers every branch of
    the reference's normalize_timestamp: trailing 'Z', explicit
    offsets, and tz-naive strings (interpreted in the UTC session
    zone = the reference's assume-UTC branch).
    """
    return F.try_to_timestamp(F.trim(raw))


def normalize_timestamps(df: DataFrame, raw_col: str = "timestamp",
                         ts_col: str = "ts_utc",
                         iso_col: str = "timestamp_iso") -> DataFrame:
    """Add (typed UTC timestamp, canonical ISO string, validity flag)
    columns; rows with unparseable/empty input carry nulls and
    `<raw>_valid` = false so callers can quarantine or side-count
    them (pair with plans.lineage.observe_counts for a one-pass
    quarantine metric)."""
    ts = parse_timestamp_expr(F.col(raw_col))
    return (df.withColumn(ts_col, ts)
              .withColumn(iso_col, iso_utc_expr(F.col(ts_col)))
              .withColumn(f"{raw_col}_valid", F.col(ts_col).isNotNull()))


def quarantine_split(df: DataFrame, raw_col: str = "timestamp"
                     ) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) after normalize_timestamps — the
    reference's parse-failure path (preprocessor.py:115-117) as a
    side table instead of a silent now() substitution."""
    out = normalize_timestamps(df, raw_col)
    flag = F.col(f"{raw_col}_valid")
    return out.where(flag), out.where(~flag)
