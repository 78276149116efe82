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


def test_resume_after_midstage_failure(spark, corpus_path,
                                       tmp_path_factory, monkeypatch):
    """Crash-resume EQUIVALENCE under an injected failure (not the
    cooperative max_buckets stop): the run dies at the worst point of
    stage 1 — message partitions already written, lineage commit not
    yet appended — so the staged parquet holds orphaned data for the
    crashed buckets.  The re-run must treat exactly those buckets as
    pending (the commit unit is the lineage row, not the data file),
    overwrite the orphans without duplication, and produce the same
    triple set as a never-crashed run."""
    from project_discord_knowledge_graph_spark.plans import (
        lineage as lineage_mod,
    )

    base = tmp_path_factory.mktemp("crash")
    out, lin = str(base / "out"), str(base / "lineage")

    # leg 1 (healthy): 3 of 8 buckets commit
    r1 = run_resumable(spark, corpus_path, out, lin, n_buckets=8,
                       max_buckets=3)
    assert completed_buckets(spark, lin, "messages") == {0, 1, 2}

    # leg 2: crash AFTER the stage-1 parquet write, BEFORE the
    # lineage append — data for buckets 3..7 lands, no commit row
    real_append = lineage_mod._append_lineage

    def crash_on_messages(spark_, path, rows):
        rows_l = rows if isinstance(rows, list) else [rows]
        if any(r.get("stage") == "messages" for r in rows_l):
            raise RuntimeError("injected crash before lineage commit")
        return real_append(spark_, path, rows)

    monkeypatch.setattr(lineage_mod, "_append_lineage",
                        crash_on_messages)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_resumable(spark, corpus_path, out, lin, n_buckets=8)
    monkeypatch.setattr(lineage_mod, "_append_lineage", real_append)

    # the orphaned write happened, but nothing new committed
    assert completed_buckets(spark, lin, "messages") == {0, 1, 2}
    staged = spark.read.parquet(f"{out}/messages")
    assert {r.bucket for r in
            staged.select("bucket").distinct().collect()} == set(range(8))

    # leg 3 (healthy resume): EXACTLY the 5 uncommitted buckets
    # recompute; the staged orphans are overwritten, not duplicated
    r3 = run_resumable(spark, corpus_path, out, lin, n_buckets=8,
                       run_id=r1["run_id"] + "r")
    assert r3["processed"] == 5 and r3["skipped"] == 3
    assert r3["pending_buckets"] == 0

    # equivalence with a clean never-crashed run
    want = build_triples(spark.read.parquet(corpus_path))
    got = spark.read.parquet(f"{out}/triples")
    assert _spo(got) == _spo(want)
    assert got.count() == want.count()  # no dup rows from orphans

    # lineage holds one completed messages-row per bucket (the crashed
    # attempt left none), and the aggregate rows_in matches the staged
    # message count
    lineage = spark.read.parquet(lin)
    per_bucket = (lineage.where(F.col("stage") == "messages")
                  .groupBy("bucket").count().collect())
    assert len(per_bucket) == 8
    assert all(r["count"] == 1 for r in per_bucket)
