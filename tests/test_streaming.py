"""Streaming surface: incremental triples, windowed aggregates,
session windows, exactly-once resume against batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_discord_knowledge_graph_spark.plans.pipeline import (
    build_triples,
)
from project_discord_knowledge_graph_spark.sources.synth import pages_df
from project_discord_knowledge_graph_spark.streaming.stream import (
    hourly_type_counts, run_available_now, session_counts, stream_pages,
    streaming_triples,
)


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    """Two landed crawl slices (separate files, like two exports)."""
    base = tmp_path_factory.mktemp("landing")
    p = str(base / "pages")
    pages_df(spark, 120, seed=3).coalesce(1).write.mode(
        "append").parquet(p)
    pages_df(spark, 80, seed=4).coalesce(1).write.mode(
        "append").parquet(p)
    return p


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_streaming_triples_matches_batch(spark, landing,
                                         tmp_path_factory):
    base = tmp_path_factory.mktemp("stream_out")
    out, ckpt = str(base / "triples"), str(base / "ckpt")
    q = streaming_triples(
        stream_pages(spark, landing, max_files_per_trigger=1), out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    batches = {r.batch_id for r in got.select("batch_id").distinct()
               .collect()}
    assert len(batches) >= 2  # one micro-batch per landed file

    # micro-batched links only span within a slice, matching the
    # reference's per-export behavior: compare against per-slice batch
    want = set()
    for seed, n in ((3, 120), (4, 80)):
        want |= _spo(build_triples(pages_df(spark, n, seed=seed)))
    assert _spo(got) == want

    # resume with nothing new landed: no-op
    q2 = streaming_triples(stream_pages(spark, landing), out, ckpt)
    q2.awaitTermination(60)
    assert _spo(spark.read.parquet(out)) == want


def test_hourly_window_stream(spark, landing, tmp_path_factory):
    base = tmp_path_factory.mktemp("win_out")
    out, ckpt = str(base / "counts"), str(base / "ckpt")
    q = run_available_now(
        hourly_type_counts(stream_pages(spark, landing),
                           watermark="1 minute"), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    total = got.agg(F.sum("n")).first()[0]
    # append mode withholds windows not yet past the watermark (the
    # ones containing the max event time); everything else emits
    assert 150 <= total <= 200


def test_session_window_stream(spark, landing, tmp_path_factory):
    base = tmp_path_factory.mktemp("sess_out")
    out, ckpt = str(base / "sessions"), str(base / "ckpt")
    q = run_available_now(
        session_counts(stream_pages(spark, landing),
                       watermark="1 minute"), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    rows = got.collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows)
    # sessions still open at the watermark are withheld (append mode)
    assert 150 <= sum(r.n_messages for r in rows) <= 200
