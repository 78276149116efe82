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
from pyspark.sql import DataFrame, SparkSession, functions as F

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


# ---------------------------------------------------------------------------
# Zipf-distributed mention universe (entity-linking stress corpus)
# ---------------------------------------------------------------------------

def zipf_triples_df(spark: SparkSession, n_triples: int,
                    n_entities: int = 2_000_000,
                    n_authors: int = 200_000,
                    seed: int = 42) -> DataFrame:
    """Synthetic triple table whose OBJECT mentions follow a
    Zipf-like (log-uniform rank) distribution over `n_entities`
    canonical entities — the adversarial entity-cardinality shape the
    toy pipeline corpus (43 canonical nodes) never exercises: a heavy
    head (rank r is drawn as floor(E^u)+1, so the heaviest entity is
    rank 2 absorbing ~ln(2)/ln(E) of all occurrences — ~4.8% at
    E=2M, the skew the salted aggregation exists for), a long
    near-singleton tail, and
    NEAR-DUP SURFACE VARIANTS (30% of occurrences spell the entity as
    base+'s' / 'the '+base / base+'-inc', all within trigram-Jaccard
    0.5 of the base) forming the tail clusters MinHash-LSH blocking
    and connected components must resolve.

    Everything is a native Spark SQL expression over spark.range —
    zero Python in the row path, so the corpus generates at any scale
    (rank r drawn as floor(E^u) with u hash-uniform per row: P(rank
    <= r) = ln(r)/ln(E), i.e. mass ~ 1/r — Zipf s=1).

    Canonical surface forms are base-36 re-encodings of md5(rank) —
    a ~36-char alphabet so the trigram space is wide (distinct
    canonicals are NOT near-dups of each other, unlike zero-padded
    serial names whose shared prefixes would merge the whole universe
    into one CC component).
    """
    u1 = (F.pmod(F.xxhash64(F.col("id"), F.lit(f"{seed}:erank")),
                 F.lit(1 << 40)) / F.lit(float(1 << 40)))
    u2 = (F.pmod(F.xxhash64(F.col("id"), F.lit(f"{seed}:arank")),
                 F.lit(1 << 40)) / F.lit(float(1 << 40)))
    e_rank = F.least(F.lit(n_entities), (F.pow(F.lit(float(n_entities)),
                                               u1)).cast("long") + 1)
    a_rank = F.least(F.lit(n_authors), (F.pow(F.lit(float(n_authors)),
                                              u2)).cast("long") + 1)

    def b36_name(prefix: str, rank, salt: str):
        h = F.md5(F.concat(F.lit(f"{seed}:{salt}:"),
                           rank.cast("string")))
        return F.concat(
            F.lit(prefix),
            F.conv(F.substring(h, 1, 12), 16, 36),
            F.conv(F.substring(h, 13, 12), 16, 36))

    base = b36_name("e:", e_rank, "ename")
    v = F.pmod(F.xxhash64(F.col("id"), F.lit(f"{seed}:variant")),
               F.lit(100))
    surface = (F.when(v < 70, base)
               .when(v < 80, F.concat(base, F.lit("s")))
               .when(v < 90, F.concat(F.lit("the "), base))
               .otherwise(F.concat(base, F.lit("-inc"))))
    author = b36_name("u:", a_rank, "aname")

    return (spark.range(n_triples)
            .select(
                author.alias("subject"),
                F.lit("mentions_asset").alias("predicate"),
                surface.alias("object"),
                F.format_string("zm%012d", F.col("id"))
                 .alias("message_id"),
                F.concat(F.lit("zseg"),
                         F.pmod(F.col("id"), F.lit(1024)).cast("string"))
                 .alias("segment_id"),
                F.lit("2024-01-01T00:00:00+00:00").alias("timestamp"),
                F.lit(0.9).alias("confidence")))
