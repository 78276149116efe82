"""Deterministic synthetic web-page corpus (BASELINE input_hint shape).

Generates the engine's primary input table
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` at any scale, seeded — the BASELINE.json rule requires
the input to be synthesized deterministically (no external data).

Content is finance-forum prose engineered to exercise every rule-path
branch of the reference semantics: all C1 classifier classes, every
extractor (E1-E8) including multi-asset x multi-action cross products,
negative percentages, >80-char topics, empty-topic fallbacks, Discord
markup for the cleaners, and threaded question/answer pairs (shared
thread => shared segment) with reply_to and @mentions inside/outside
the 10-minute window for the J1/J2 linkers.

The generator also returns the plain message dicts so the pure-Python
oracle (oracle/reference_port.py) can run on the identical corpus.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Any

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from ..functions.html import render_page

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=_dt.timezone.utc)

_CHANNELS = ("options-den", "crypto-corner", "etf-talk", "daily-chat",
             "alerts-feed")
_ASSETS = ("TQQQ", "SPY", "QQQ", "BTC", "ETH", "AAPL", "TSLA", "NVDA",
           "VTI", "SOL", "ARKK", "MSFT")
_STRATS = ("wheel", "covered call", "iron condor", "dca", "dollar cost",
           "symphony", "algorithm", "backtest")
_PLATFORMS = ("composer", "robinhood", "fidelity", "stonks.com")

# Templates: {a}/{a2} asset, {s} strategy, {p} platform, {pct} percent.
# Grouped by the C1 class the rendered text lands in (validated by
# tests against the oracle classifier).
_QUESTION_TMPL = (
    "what do you all think about {s} on {a}?",
    "how would you size a {s} when {a} keeps dropping?",
    "anyone know if {p} supports fractional shares of {a}?",
    "which is better for a roth, {a} or {a2}?",
    "should i keep averaging into {a} every week or wait? looking for thoughts on whether the current drawdown changes the math at all",
    "why is {a} moving like this today?",
    "what is",
    "could someone explain how assignment works with the {s}?",
)
_ANSWER_TMPL = (
    "i have been running the {s} on {a} for two years and it has worked out fine for me, just keep your size small",
    "in my experience {p} fills are fine for {a}, never had an issue with them honestly",
    "the key thing with {a} is patience, it does nothing for months and then catches up all at once",
    "you want to look at the funding rate for {a} first, that tells you most of what you need",
    "it depends on your horizon, for anything under a year i would not touch {a} at all",
)
_ALERT_TMPL = (
    "alert: fomc meeting starts in 1 hour, expect high volatility",
    "warning: cpi print tomorrow 8:30am, watch {a} closely",
    "notice: earnings for {a} after close, volatility expected",
    "reminder: fed minutes drop at 2pm, caution advised on {a}",
    "announcement: maintenance window tonight, alerts paused",
)
_STRATEGY_TMPL = (
    "my plan is to run the {s} on {a} into the event",
    "new setup: {s} paired with a small {a} position",
    "thinking about a {s} approach for the {a} trade this month",
    "the {s} has been my main strategy lately",
    "position update: rolled the {s} out a week",
)
_ANALYSIS_TMPL = (
    "my outlook for {a} is sideways into the summer, support at the 50dma",
    "technical analysis on {a}: trend intact, resistance overhead",
    "forecast: {a} grinds higher while sentiment stays washed out",
    "chart pattern on {a} looks like a textbook flag, expect continuation",
)
_PERF_TMPL = (
    "made {pct}% profit this month using {s} on {a}",
    "my {a} position shows a {pct}% gain since january",
    "backtest return came in at {pct}% for the {s}",
    "lost {pct2}% on {a} this week, rough performance",
)
_DISCUSSION_TMPL = (
    "coffee first, then {p} and {a} memes",
    "lol the {p} ui again, {a} folks know",
    "weekend vibes, maybe some {a} reading",
    "gm everyone, {a} on my mind",
)
_SIGNALISH_TMPL = (  # classified strategy by C1 (buy/sell words) but
    # exercises asset x action extraction when type is preset
    "buying {a} and {a2} here, bullish on both",
    "selling my {a} into strength, short term only",
    "holding {a} through earnings, hodl gang",
)
_MARKUP_TMPL = (
    "hey <@123456> check <#987654> for the {a} thread <:rocket:555>",
    "thanks <@!222333>   big   help\n\n\n\nsee you in <#444555>",
)

_TYPE_BANK = (
    ("question", _QUESTION_TMPL, 22),
    ("answer", _ANSWER_TMPL, 18),
    ("alert", _ALERT_TMPL, 12),
    ("strategy", _STRATEGY_TMPL, 14),
    ("analysis", _ANALYSIS_TMPL, 10),
    ("performance", _PERF_TMPL, 10),
    ("discussion", _DISCUSSION_TMPL, 6),
    ("signalish", _SIGNALISH_TMPL, 5),
    ("markup", _MARKUP_TMPL, 3),
)
_LANGS = ("en", "en", "en", "en", "es", "de", "fr", "zh")


def gen_messages(n: int, seed: int = 42) -> list[dict[str, Any]]:
    """Deterministic raw-message corpus of size n (plus QA threads)."""
    rng = random.Random(seed)
    weights = [w for _, _, w in _TYPE_BANK]
    out: list[dict[str, Any]] = []
    i = 0
    while i < n:
        kind, tmpls, _ = rng.choices(_TYPE_BANK, weights=weights, k=1)[0]
        a, a2 = rng.sample(_ASSETS, 2)
        text = rng.choice(tmpls).format(
            a=a.lower(), a2=a2.lower(), s=rng.choice(_STRATS),
            p=rng.choice(_PLATFORMS), pct=round(rng.uniform(0.5, 40), 1),
            pct2=round(rng.uniform(0.5, 40), 1),
        )
        channel = rng.choice(_CHANNELS)
        author = f"user{rng.randrange(40)}"
        # sub-second component exercises the microsecond-preserving
        # P2 path (isoformat parity + µs-exact J2 window math) e2e
        ts = _BASE_TS + _dt.timedelta(seconds=137 * i + rng.randrange(60),
                                      microseconds=rng.randrange(1_000_000))
        msg = {
            "message_id": f"m{i:09d}",
            "channel": channel,
            "author": author,
            "thread": None,
            "reply_to": None,
            "mentions": [],
            "lang": rng.choice(_LANGS),
            "timestamp": ts,
            "content": text,
        }
        out.append(msg)
        i += 1

        # every question spawns a threaded answer ~60% of the time so
        # the linkers have work; answers land inside or outside the
        # 10-minute window
        if kind == "question" and i < n and rng.random() < 0.6:
            thread = f"t {channel} {i // 7}"
            msg["thread"] = thread
            delta = rng.choice((120, 300, 540, 660, 1200))  # secs after q
            ans_author = f"user{rng.randrange(40)}"
            ans = {
                "message_id": f"m{i:09d}",
                "channel": channel,
                "author": ans_author,
                "thread": thread,
                "reply_to": msg["message_id"] if rng.random() < 0.5 else None,
                "mentions": [author] if rng.random() < 0.7 else [],
                "lang": "en",
                "timestamp": ts + _dt.timedelta(seconds=delta),
                "content": rng.choice(_ANSWER_TMPL).format(
                    a=a.lower(), a2=a2.lower(), s=rng.choice(_STRATS),
                    p=rng.choice(_PLATFORMS)),
            }
            out.append(ans)
            i += 1
    return out


def _iso(ts: _dt.datetime) -> str:
    return ts.isoformat()


def messages_for_oracle(raw: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Shape raw messages the way the reference preprocessor would
    (ISO timestamp strings); clean_text/type/segment_id are filled by
    the oracle pipeline in tests."""
    return [dict(m, timestamp=_iso(m["timestamp"])) for m in raw]


PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), False),
    StructField("text", StringType(), False),
    StructField("lang", StringType(), False),
])


def pages_rows(raw: list[dict[str, Any]]) -> list[tuple]:
    rows = []
    for m in raw:
        html = render_page(
            message_id=m["message_id"], author=m["author"],
            channel=m["channel"], thread=m["thread"],
            reply_to=m["reply_to"], mentions=m["mentions"],
            lang=m["lang"], text=m["content"],
        )
        url = (f"https://forum.example.com/{m['channel']}/"
               f"{m['message_id']}")
        rows.append((url, m["timestamp"], html.encode("utf-8"),
                     m["content"], m["lang"]))
    return rows


def pages_df(spark: SparkSession, n: int, seed: int = 42,
             partitions: int | None = None):
    """Synthesize the pages table as a DataFrame (deterministic)."""
    raw = gen_messages(n, seed)
    df = spark.createDataFrame(pages_rows(raw), PAGES_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df


def write_pages(spark: SparkSession, path: str, n: int, seed: int = 42,
                partitions: int = 32) -> None:
    """Materialize a pages corpus to parquet (bench input).  At real
    scale this table is the Iceberg-cataloged crawl, partitioned by
    days(warc_ts); parquet stands in locally."""
    pages_df(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
