"""Checkpoint-resume semantics: crash mid-run, resume, idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_discord_knowledge_graph_spark.plans.lineage import (
    completed_buckets, run_resumable,
)
from project_discord_knowledge_graph_spark.plans.pipeline import (
    build_triples,
)
from project_discord_knowledge_graph_spark.sources.synth import pages_df


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("lineage") / "pages")
    pages_df(spark, 300, seed=11).write.parquet(p)
    return p


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_crash_resume_idempotent(spark, corpus_path, tmp_path_factory):
    base = tmp_path_factory.mktemp("run")
    out, lin = str(base / "out"), str(base / "lineage")

    # "crash" after 3 of 8 message buckets: no triples yet
    r1 = run_resumable(spark, corpus_path, out, lin, n_buckets=8,
                       max_buckets=3)
    assert r1["processed"] == 3 and r1["pending_buckets"] == 5
    assert completed_buckets(spark, lin, "messages") == {0, 1, 2}

    # resume: remaining 5 buckets + the global aggregate stage
    r2 = run_resumable(spark, corpus_path, out, lin, n_buckets=8)
    assert r2["processed"] == 5 and r2["skipped"] == 3
    assert r2["pending_buckets"] == 0 and r2["triples_out"] > 0

    # stage 1 is ONE pass: its job group holds a constant number of
    # jobs (stats + write + counts), not O(n_buckets)
    tracker = spark.sparkContext.statusTracker()
    jobs = tracker.getJobIdsForGroup(f"kg_stage1_{r2['run_id']}")
    assert 0 < len(jobs) <= 8, jobs

    # full output equals the one-shot pipeline (set semantics,
    # including the segment-local answered_by links)
    got = spark.read.parquet(f"{out}/triples")
    want = build_triples(spark.read.parquet(corpus_path))
    assert _spo(got) == _spo(want)
    assert "answered_by" in {r.predicate for r in got.collect()}

    # re-running once complete reprocesses no buckets
    r3 = run_resumable(spark, corpus_path, out, lin, n_buckets=8)
    assert r3["processed"] == 0 and r3["skipped"] == 8
    n_again = spark.read.parquet(f"{out}/triples").count()
    assert n_again == r2["triples_out"]  # overwrite, not append

    # lineage rows carry the required fields
    lineage = spark.read.parquet(lin)
    msg_rows = lineage.where(F.col("stage") == "messages").collect()
    assert len(msg_rows) == 8
    assert all(r.status == "completed" and r.rows_in > 0
               and r.url_range_start <= r.url_range_end
               and r.warc_ts_watermark is not None
               and r.duration_ms >= 0 for r in msg_rows)
    agg_rows = lineage.where(F.col("stage") == "aggregate").collect()
    assert len(agg_rows) >= 2  # r2 and r3 both ran the global stage
    assert all(r.triples_out == r2["triples_out"] for r in agg_rows)
