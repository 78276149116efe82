"""Distributed deterministic pages-corpus generator.

Unlike sources/synth.py (driver-side, sequential-RNG, used by the
parity tests), this generator is *index-deterministic*: every field
of row i is a pure function of (seed, i), so the corpus can be built
in parallel with mapInPandas over spark.range(n) at any scale — the
generation pattern a 100 TB synthetic benchmark actually needs.

Structure: i % 5 == 0 -> question; i % 5 == 1 -> its threaded answer
(shared thread => shared segment; mentions/reply_to/time-delta drawn
per-index so J1/J2 links fire inside and outside the 10-minute
window); other rows draw from the same template banks as synth.py.
"""

from __future__ import annotations

import datetime as _dt
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.html import render_page
from .synth import (
    _ALERT_TMPL, _ANALYSIS_TMPL, _ANSWER_TMPL, _ASSETS, _BASE_TS, _CHANNELS,
    _DISCUSSION_TMPL, _LANGS, _MARKUP_TMPL, _PERF_TMPL, _PLATFORMS,
    _QUESTION_TMPL, _SIGNALISH_TMPL, _STRATEGY_TMPL, _STRATS, PAGES_SCHEMA,
)

_OTHER_BANK = (
    (_ALERT_TMPL, 14),
    (_STRATEGY_TMPL, 16),
    (_ANALYSIS_TMPL, 12),
    (_PERF_TMPL, 12),
    (_DISCUSSION_TMPL, 7),
    (_SIGNALISH_TMPL, 6),
    (_MARKUP_TMPL, 3),
    (_QUESTION_TMPL, 10),   # extra unthreaded questions
    (_ANSWER_TMPL, 20),     # unthreaded answers
)


def _rng(seed: int, i: int, field: str) -> random.Random:
    return random.Random(f"{seed}:{i}:{field}")


def _fill(tmpl: str, rng: random.Random) -> str:
    a, a2 = rng.sample(_ASSETS, 2)
    return tmpl.format(
        a=a.lower(), a2=a2.lower(), s=rng.choice(_STRATS),
        p=rng.choice(_PLATFORMS), pct=round(rng.uniform(0.5, 40), 1),
        pct2=round(rng.uniform(0.5, 40), 1))


def _q_ts(seed: int, i: int) -> _dt.datetime:
    return _BASE_TS + _dt.timedelta(
        seconds=137 * i + _rng(seed, i, "ts").randrange(60))


def _author(seed: int, i: int) -> str:
    return f"user{_rng(seed, i, 'author').randrange(40)}"


def _channel(seed: int, i: int) -> str:
    # the Q/A pair shares the question's channel
    base = i - 1 if i % 5 == 1 else i
    return _rng(seed, base, "channel").choice(_CHANNELS)


def build_msg(i: int, seed: int) -> dict:
    channel = _channel(seed, i)
    author = _author(seed, i)
    row = {
        "message_id": f"m{i:09d}",
        "channel": channel,
        "author": author,
        "thread": None,
        "reply_to": None,
        "mentions": [],
        "lang": _rng(seed, i, "lang").choice(_LANGS),
        "timestamp": _q_ts(seed, i),
    }
    mod = i % 5
    if mod == 0:
        row["content"] = _fill(
            _rng(seed, i, "tmpl").choice(_QUESTION_TMPL),
            _rng(seed, i, "fill"))
        row["thread"] = f"t {channel} {i // 5}"
    elif mod == 1:
        q = i - 1
        r = _rng(seed, i, "ans")
        row["thread"] = f"t {channel} {q // 5}"
        row["timestamp"] = _q_ts(seed, q) + _dt.timedelta(
            seconds=r.choice((120, 300, 540, 660, 1200)))
        row["reply_to"] = f"m{q:09d}" if r.random() < 0.5 else None
        row["mentions"] = [_author(seed, q)] if r.random() < 0.7 else []
        row["content"] = _fill(r.choice(_ANSWER_TMPL), _rng(seed, i, "fill"))
    else:
        banks, weights = zip(*_OTHER_BANK)
        bank = _rng(seed, i, "bank").choices(banks, weights=weights, k=1)[0]
        row["content"] = _fill(_rng(seed, i, "tmpl").choice(bank),
                               _rng(seed, i, "fill"))
    return row


def _page_tuple(i: int, seed: int) -> tuple:
    m = build_msg(i, seed)
    html = render_page(
        message_id=m["message_id"], author=m["author"], channel=m["channel"],
        thread=m["thread"], reply_to=m["reply_to"], mentions=m["mentions"],
        lang=m["lang"], text=m["content"])
    url = f"https://forum.example.com/{m['channel']}/{m['message_id']}"
    return (url, m["timestamp"], html.encode("utf-8"), m["content"],
            m["lang"])


def pages_df_dist(spark: SparkSession, n: int, seed: int = 42,
                  partitions: int = 128) -> DataFrame:
    """Distributed corpus build: spark.range -> mapInPandas."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [_page_tuple(int(i), seed) for i in b["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA])

    return (spark.range(0, n, numPartitions=partitions)
            .mapInPandas(gen, PAGES_SCHEMA))


def write_pages_dist(spark: SparkSession, path: str, n: int, seed: int = 42,
                     partitions: int = 128) -> None:
    pages_df_dist(spark, n, seed, partitions).write.mode(
        "overwrite").parquet(path)
