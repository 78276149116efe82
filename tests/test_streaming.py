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


def test_streaming_discord_exports(spark, tmp_path_factory):
    """S1 streaming: channel-export JSON files landing one per
    micro-batch, flattened + run through the full rule path with
    exactly-once file tracking (a re-run with nothing new is a
    no-op; a newly landed export processes incrementally)."""
    import json as _json

    from project_discord_knowledge_graph_spark.streaming.stream import (
        stream_discord_exports, streaming_export_triples,
    )

    base = tmp_path_factory.mktemp("exp_stream")
    land = base / "landing"
    land.mkdir()

    def export(n, qid):
        return {"channel": {"id": f"c{n}", "name": f"chan{n}"},
                "messages": [
                    {"id": qid,
                     "timestamp": f"2024-01-0{n}T03:00:00Z",
                     "content": "what should i buy, btc or eth?",
                     "author": {"id": "a1", "name": "Asker"}},
                    {"id": qid + "-al",
                     "timestamp": f"2024-01-0{n}T03:01:00Z",
                     "content": "alert: fomc meeting starts soon",
                     "author": {"id": "a2", "name": "Alerter"}}]}

    (land / "e1.json").write_text(_json.dumps(export(1, "q1")))
    (land / "e2.json").write_text(_json.dumps(export(2, "q2")))

    out, ckpt = str(base / "triples"), str(base / "ckpt")
    q = streaming_export_triples(
        stream_discord_exports(spark, str(land), max_files_per_trigger=1),
        out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.select("batch_id").distinct().count() >= 2
    assert got.count() == 4  # 2 exports x (asks_about + alerts)

    # nothing new -> no-op
    q2 = streaming_export_triples(
        stream_discord_exports(spark, str(land)), out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 4

    # a third export lands -> only it is processed
    (land / "e3.json").write_text(_json.dumps(export(3, "q3")))
    q3 = streaming_export_triples(
        stream_discord_exports(spark, str(land)), out, ckpt)
    q3.awaitTermination(60)
    got3 = spark.read.parquet(out)
    assert got3.count() == 6
    assert "q3" in {r.message_id for r in got3.collect()}


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


def test_stateful_cross_batch_link(spark, tmp_path_factory):
    """applyInPandasWithState custom operator: a question landing in
    one export file and its reply landing in a LATER file still link
    (per-batch foreachBatch linking cannot see across files); open-
    question state persists across micro-batches and across restarts
    via the checkpoint."""
    import json as _json

    from project_discord_knowledge_graph_spark.streaming.stream import (
        stateful_link_qa, stream_discord_exports,
    )

    import os as _os

    base = tmp_path_factory.mktemp("state_link")
    land = base / "landing"
    land.mkdir()
    thread = {"name": "same thread"}
    (land / "e1.json").write_text(_json.dumps({
        "channel": {"id": "c", "name": "qa"},
        "messages": [
            {"id": "q1", "timestamp": "2024-01-02T03:00:00Z",
             "content": "what should i buy, btc or eth?",
             "author": {"id": "a1", "name": "Asker"},
             "thread": thread}]}))
    (land / "e2.json").write_text(_json.dumps({
        "channel": {"id": "c", "name": "qa"},
        "messages": [
            {"id": "ans1", "timestamp": "2024-01-02T03:05:00Z",
             "content": "i kept mine for two years and it worked out"
                        " fine, just keep the size small",
             "author": {"id": "a2", "name": "Helper"},
             "reference": {"messageId": "q1"},
             "thread": thread}]}))
    # distinct mtimes: the file source orders micro-batches by
    # modification time, and the landing files must arrive q-first
    # (as they would in production, landing over time)
    _os.utime(land / "e1.json", (1_700_000_000, 1_700_000_000))
    _os.utime(land / "e2.json", (1_700_000_100, 1_700_000_100))

    from project_discord_knowledge_graph_spark.operators.classify import (
        with_type,
    )
    out, ckpt = str(base / "links"), str(base / "ckpt")
    msgs = with_type(stream_discord_exports(spark, str(land),
                                            max_files_per_trigger=1))
    q = run_available_now(stateful_link_qa(msgs), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    rows = got.collect()
    assert [(r.subject, r.predicate, r.object) for r in rows] == [
        ("q1", "answered_by", "ans1")]
    assert rows[0].confidence == 0.95

    # restart with a third file: state restored from the checkpoint.
    # ans2 MENTIONS the old question's author (no reference) within
    # the 10-minute window -> J2 mention link, confidence 0.80
    (land / "e3.json").write_text(_json.dumps({
        "channel": {"id": "c", "name": "qa"},
        "messages": [
            {"id": "ans2", "timestamp": "2024-01-02T03:07:00Z",
             "content": "same experience here, it does nothing for"
                        " months and then catches up all at once",
             "author": {"id": "a3", "name": "Other"},
             "mentions": [{"id": None, "name": "Asker"}],
             "thread": thread}]}))
    msgs2 = with_type(stream_discord_exports(spark, str(land)))
    q2 = run_available_now(stateful_link_qa(msgs2), out, ckpt)
    q2.awaitTermination(120)
    by_obj = {r.object: r for r in spark.read.parquet(out).collect()}
    assert set(by_obj) == {"ans1", "ans2"}
    assert by_obj["ans1"].message_id == "q1_reply_ans1"
    assert by_obj["ans2"].message_id == "q1_mention_ans2"
    assert by_obj["ans2"].confidence == 0.80
    assert by_obj["ans2"].subject == "q1"


def test_stateful_prune_handles_space_separated_stamps(
        spark, tmp_path_factory):
    """Regression: the event-time prune must parse timestamps, not
    string-compare them — a 'T'-separated cutoff against the corpus's
    space-separated stamps would wrongly prune a same-day question
    ('2024-01-09 18:00' < '2024-01-09T12:00' at char 10) and drop the
    cross-batch link."""
    import json as _json
    import os as _os

    from project_discord_knowledge_graph_spark.streaming.stream import (
        stateful_link_qa,
    )

    base = tmp_path_factory.mktemp("prune_fmt")
    land = base / "land"
    land.mkdir()
    # question 18h before the answer — inside the 24h open window
    (land / "f1.jsonl").write_text(_json.dumps(
        {"segment_id": "s1", "message_id": "q1", "type": "question",
         "author": "alice", "mentions": [], "reply_to": None,
         "timestamp": "2024-01-09 18:00:00"}) + "\n")
    (land / "f2.jsonl").write_text(_json.dumps(
        {"segment_id": "s1", "message_id": "a1", "type": "answer",
         "author": "bob", "mentions": [], "reply_to": "q1",
         "timestamp": "2024-01-10 12:00:00"}) + "\n")
    _os.utime(land / "f1.jsonl", (1_700_000_000, 1_700_000_000))
    _os.utime(land / "f2.jsonl", (1_700_000_100, 1_700_000_100))

    schema = ("segment_id string, message_id string, type string, "
              "author string, mentions array<string>, "
              "reply_to string, timestamp string")
    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", "1").json(str(land))
    out, ckpt = str(base / "out"), str(base / "ckpt")
    q = run_available_now(stateful_link_qa(stream), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert [(r.subject, r.object) for r in got] == [("q1", "a1")]


def test_stateful_linker_matches_batch_joins(spark, tmp_path_factory):
    """Equivalence gate: the stateful linker over the full events
    corpus (single batch) must emit EXACTLY the batch J1+J2 join
    results — same link ids, same confidences — including the
    no-lower-bound J2 quirk (answers preceding their question)."""
    from project_discord_knowledge_graph_spark.entry_queries import (
        events_messages,
    )
    from project_discord_knowledge_graph_spark.operators.link import (
        link_by_mentions, link_by_replies, split_qa,
    )
    from project_discord_knowledge_graph_spark.streaming.stream import (
        stateful_link_qa,
    )

    sf = "/root/testdata/sf0.001"
    msgs = events_messages(spark, sf)
    questions, answers = split_qa(msgs)
    want = {(r.subject, r.object, r.message_id, r.confidence)
            for r in link_by_replies(questions, answers)
            .unionByName(link_by_mentions(questions, answers))
            .select("subject", "object", "message_id", "confidence")
            .collect()}

    base = tmp_path_factory.mktemp("equiv")
    src = str(base / "msgs")
    msgs.select("segment_id", "message_id", "type", "author",
                "mentions", "reply_to", "timestamp") \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out, ckpt = str(base / "links"), str(base / "ckpt")
    q = run_available_now(stateful_link_qa(stream), out, ckpt)
    q.awaitTermination(120)
    got = {(r.subject, r.object, r.message_id, r.confidence)
           for r in spark.read.parquet(out).collect()}
    assert got == want and len(got) > 20, (
        len(got), len(want), list(got ^ want)[:5])


def test_hourly_window_late_data(spark, tmp_path_factory):
    """Out-of-order landing files against the watermarked hourly
    window: a late row within the watermark folds into its correct
    (still-open) bucket — with window STATE carried across runs via
    the checkpoint — while a row behind an already-closed window is
    dropped, per watermark semantics."""
    import datetime as dt

    from project_discord_knowledge_graph_spark.functions.html import (
        render_page,
    )

    def page_rows(specs):
        # specs: list of (msg_id, hour, minute, count)
        rows = []
        for mid, h, m, n in specs:
            for i in range(n):
                ts = dt.datetime(2024, 1, 5, h, m + i, 0)
                html = render_page(
                    message_id=f"{mid}-{i}", author="alice",
                    channel="chan", thread=None, reply_to=None,
                    mentions=[], lang="en",
                    text="alert: fomc meeting starts in 1 hour")
                rows.append((f"http://x/{mid}-{i}", ts,
                             html.encode(), None, "en"))
        return rows

    base = tmp_path_factory.mktemp("late")
    land = base / "pages"
    land.mkdir()
    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")

    # file 1: hours 10 (x5), 11 (x3), 14:30 (x2)
    # -> watermark(2h) = 12:30; windows 10 and 11 close and emit
    spark.createDataFrame(
        page_rows([("a", 10, 5, 5), ("b", 11, 5, 3), ("c", 14, 30, 2)]),
        schema).coalesce(1).write.mode("append").parquet(str(land / "f1"))

    out, ckpt = str(base / "counts"), str(base / "ckpt")

    def drain():
        q = run_available_now(
            hourly_type_counts(
                spark.readStream.schema(schema).parquet(str(land) + "/*"),
                watermark="2 hours"), out, ckpt)
        q.awaitTermination(120)
        return {r.hour_start.hour: r.n
                for r in spark.read.parquet(out).collect()}

    got1 = drain()
    assert got1 == {10: 5, 11: 3}  # 14:00 window still open, withheld

    # file 2 lands late: 11:30 is BEHIND the closed hour-11 window
    # (dropped); 13:10 is late but its window is still open (kept);
    # 17:00 advances the watermark to 15:00, closing hours 13 and 14
    spark.createDataFrame(
        page_rows([("late11", 11, 30, 1), ("late13", 13, 10, 1),
                   ("adv", 17, 0, 1)]),
        schema).coalesce(1).write.mode("append").parquet(str(land / "f2"))

    got2 = drain()
    assert got2[13] == 1          # late row folded into its bucket
    assert got2[14] == 2          # state carried across runs
    assert got2[11] == 3          # too-late row dropped, count unchanged
    assert 17 not in got2         # newest window withheld (append mode)


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


def test_stateful_linker_mixed_naive_aware_stamps(
        spark, tmp_path_factory):
    """Regression (round-4 advice): a mention link between a question
    with an offset-bearing stamp and an answer with a naive stamp must
    still be emitted — naive stamps are taken as UTC, matching the
    batch join's cast-to-timestamp_ltz under the pinned-UTC session.
    (Previously the aware-minus-naive subtraction raised TypeError and
    the link was silently dropped.)"""
    import json as _json
    import os as _os

    from project_discord_knowledge_graph_spark.operators.link import (
        link_by_mentions, split_qa,
    )
    from project_discord_knowledge_graph_spark.streaming.stream import (
        stateful_link_qa,
    )

    # q at 08:01+05:00 == 03:01Z; naive answer at 03:05 (UTC) mentions
    # the asker 4 minutes later — inside the 10-minute J2 window
    rows = [
        ("s1", "q1", "question", "alice", [], None,
         "2024-01-02T08:01:00+05:00"),
        ("s1", "a1", "answer", "bob", ["alice"], None,
         "2024-01-02 03:05:00"),
    ]
    cols = ("segment_id string, message_id string, type string, "
            "author string, mentions array<string>, reply_to string, "
            "timestamp string")

    # batch ground truth: the LTZ-cast join links the pair
    msgs = spark.createDataFrame(rows, cols).withColumn(
        "warc_ts", F.col("timestamp"))
    questions, answers = split_qa(msgs)
    want = {(r.subject, r.object, r.confidence)
            for r in link_by_mentions(questions, answers).collect()}
    assert want == {("q1", "a1", 0.80)}

    # the stateful linker over the same rows, q and a in SEPARATE
    # micro-batches (cross-batch state must survive the comparison)
    base = tmp_path_factory.mktemp("mixed_tz")
    land = base / "land"
    land.mkdir()
    for i, r in enumerate(rows):
        (land / f"f{i}.jsonl").write_text(_json.dumps(dict(zip(
            ["segment_id", "message_id", "type", "author", "mentions",
             "reply_to", "timestamp"], r))) + "\n")
        _os.utime(land / f"f{i}.jsonl",
                  (1_700_000_000 + 100 * i,) * 2)
    stream = spark.readStream.schema(cols) \
        .option("maxFilesPerTrigger", "1").json(str(land))
    out, ckpt = str(base / "out"), str(base / "ckpt")
    q = run_available_now(stateful_link_qa(stream), out, ckpt)
    q.awaitTermination(120)
    got = {(r.subject, r.object, r.confidence)
           for r in spark.read.parquet(out).collect()}
    assert got == want


def test_streaming_cross_batch_dedup(spark, tmp_path_factory):
    """MERGE-style sink: a triple re-extracted in a LATER batch (same
    normalized s|p|o key) must not land twice; a genuinely new triple
    in the same batch must.  And replaying the whole stream (fresh
    checkpoint over the same landing folder) must leave the sink
    unchanged — the anti-join makes at-least-once delivery idempotent.
    Default mode keeps the reference's per-batch dedup scope, so the
    duplicate DOES land there (contract check)."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from project_discord_knowledge_graph_spark.streaming.stream import (
        stream_discord_exports, streaming_export_triples,
    )

    base = tmp_path_factory.mktemp("xbatch_dedup")
    land = base / "landing"
    land.mkdir()
    alert = "alert: fomc meeting starts in 1 hour"

    def export(msgs):
        return _json.dumps({
            "channel": {"id": "c", "name": "alerts"},
            "messages": [
                {"id": mid, "timestamp": ts, "content": text,
                 "author": {"id": aid, "name": author}}
                for mid, ts, author, aid, text in msgs]})

    (land / "e1.json").write_text(export([
        ("m1", "2024-01-02T03:00:00Z", "Alice", "a1", alert)]))
    # batch 2: m2 re-produces Alice's IDENTICAL alert (same s|p|o);
    # m3 is a new alert from Bob
    (land / "e2.json").write_text(export([
        ("m2", "2024-01-02T05:00:00Z", "Alice", "a1", alert),
        ("m3", "2024-01-02T05:01:00Z", "Bob", "b1",
         "alert: cpi print due tomorrow morning")]))
    _os.utime(land / "e1.json", (1_700_000_000, 1_700_000_000))
    _os.utime(land / "e2.json", (1_700_000_100, 1_700_000_100))

    def drain(out, ckpt, **kw):
        msgs = stream_discord_exports(spark, str(land),
                                      max_files_per_trigger=1)
        q = streaming_export_triples(msgs, out, ckpt, **kw)
        q.awaitTermination(120)
        return spark.read.parquet(out)

    # merged sink: each key exactly once, Alice's re-extraction pinned
    # to the batch that saw it first
    out, ckpt = str(base / "merged"), str(base / "ckpt")
    got = drain(out, ckpt, cross_batch_dedup=True)
    per_key = {r._key: (r.n, r.first_b) for r in
               got.groupBy("_key").agg(
                   F.count("*").alias("n"),
                   F.min("batch_id").alias("first_b")).collect()}
    assert all(n == 1 for n, _ in per_key.values()), per_key
    alice_keys = [k for k in per_key if "alice" in k or "a1" in k]
    assert alice_keys, list(per_key)
    assert all(per_key[k][1] == 0 for k in alice_keys)
    assert any(per_key[k][1] == 1 for k in per_key)  # Bob's landed

    # replay from scratch (fresh checkpoint, same sink): no growth
    before = sorted(r._key for r in got.select("_key").collect())
    _shutil.rmtree(ckpt)
    got2 = drain(out, ckpt + "2", cross_batch_dedup=True)
    after = sorted(r._key for r in got2.select("_key").collect())
    assert after == before

    # default mode documents the per-batch scope: the cross-batch
    # duplicate lands once per batch that extracted it
    got_def = drain(str(base / "plain"), str(base / "ckpt_plain"))
    spo = [(r.subject, r.predicate, r.object)
           for r in got_def.collect()]
    assert any(spo.count(t) == 2 for t in set(spo)), spo


def test_streaming_extraction_dedup_watermark_state(
        spark, tmp_path_factory):
    """Native bounded-state cross-batch dedup: a triple re-extracted
    in a LATER batch within the watermark is dropped by
    dropDuplicatesWithinWatermark state (first arrival wins); a new
    key in the same batch lands; state survives a checkpointed
    restart."""
    import json as _json
    import os as _os

    from project_discord_knowledge_graph_spark.streaming.stream import (
        stream_discord_exports, streaming_extraction_dedup,
    )

    base = tmp_path_factory.mktemp("wm_dedup")
    land = base / "landing"
    land.mkdir()
    alert = "alert: fomc meeting starts in 1 hour"

    def export(name, msgs):
        (land / name).write_text(_json.dumps({
            "channel": {"id": "c", "name": "alerts"},
            "messages": [
                {"id": mid, "timestamp": ts, "content": text,
                 "author": {"id": aid, "name": author}}
                for mid, ts, author, aid, text in msgs]}))

    export("e1.json", [
        ("m1", "2024-01-02T03:00:00Z", "Alice", "a1", alert)])
    export("e2.json", [
        # same (s,p,o) as m1, 2h later — inside the 24h watermark
        ("m2", "2024-01-02T05:00:00Z", "Alice", "a1", alert),
        ("m3", "2024-01-02T05:01:00Z", "Bob", "b1",
         "alert: cpi print due tomorrow morning"),
        # unparseable stamp: no event time -> quarantined past the
        # dedup (kept with NULL event_ts), never silently dropped
        ("m9", "not-a-timestamp", "Carol", "c1",
         "alert: witching friday, expect wild prints")])
    _os.utime(land / "e1.json", (1_700_000_000, 1_700_000_000))
    _os.utime(land / "e2.json", (1_700_000_100, 1_700_000_100))

    out, ckpt = str(base / "out"), str(base / "ckpt")
    msgs = stream_discord_exports(spark, str(land),
                                  max_files_per_trigger=1)
    q = run_available_now(streaming_extraction_dedup(msgs), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    by_subj = {(r.subject, r.object): r.message_id
               for r in got.collect()}
    # alice's re-extraction was deduped to the FIRST arrival (m1);
    # bob's new alert landed; carol's unparseable-stamp triple was
    # quarantined through (NULL event_ts), not dropped
    assert sorted(by_subj.values()) == ["m1", "m3", "m9"]
    assert "_key" not in got.columns
    null_ts = {r.message_id: r.event_ts is None for r in got.collect()}
    assert null_ts["m9"] and not null_ts["m1"]

    # restart with a third file inside the watermark: still deduped
    export("e3.json", [
        ("m4", "2024-01-02T06:00:00Z", "Alice", "a1", alert)])
    msgs2 = stream_discord_exports(spark, str(land))
    q2 = run_available_now(streaming_extraction_dedup(msgs2), out, ckpt)
    q2.awaitTermination(120)
    assert sorted(
        r.message_id for r in spark.read.parquet(out).collect()
    ) == ["m1", "m3", "m9"]


def test_streaming_extraction_dedup_quarantine_collapses(
        spark, tmp_path_factory):
    """The quarantined (unparseable-stamp) branch gets its own keyed
    dedup: duplicate unparseable-stamp triples — same normalized
    (s,p,o), within one batch AND across batches — collapse to one
    row instead of bypassing dedup entirely."""
    import json as _json
    import os as _os

    from project_discord_knowledge_graph_spark.streaming.stream import (
        stream_discord_exports, streaming_extraction_dedup,
    )

    base = tmp_path_factory.mktemp("quar_dedup")
    land = base / "landing"
    land.mkdir()
    alert = "alert: witching friday, expect wild prints"

    def export(name, msgs):
        (land / name).write_text(_json.dumps({
            "channel": {"id": "c", "name": "alerts"},
            "messages": [
                {"id": mid, "timestamp": ts, "content": text,
                 "author": {"id": aid, "name": author}}
                for mid, ts, author, aid, text in msgs]}))

    # batch 1: TWO unparseable-stamp duplicates of Carol's alert in
    # the SAME batch, plus one parseable control row
    export("e1.json", [
        ("m1", "not-a-timestamp", "Carol", "c1", alert),
        ("m2", "also-not-a-timestamp", "Carol", "c1", alert),
        ("m3", "2024-01-02T03:00:00Z", "Alice", "a1",
         "alert: fomc meeting starts in 1 hour")])
    # batch 2: a THIRD unparseable-stamp duplicate (cross-batch)
    export("e2.json", [
        ("m4", "still-not-a-timestamp", "Carol", "c1", alert)])
    _os.utime(land / "e1.json", (1_700_000_000, 1_700_000_000))
    _os.utime(land / "e2.json", (1_700_000_100, 1_700_000_100))

    out, ckpt = str(base / "out"), str(base / "ckpt")
    msgs = stream_discord_exports(spark, str(land),
                                  max_files_per_trigger=1)
    q = run_available_now(streaming_extraction_dedup(msgs), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    carol = [r for r in got if r.message_id in ("m1", "m2", "m4")]
    assert len(carol) == 1, [r.message_id for r in got]
    assert carol[0].event_ts is None
    assert sorted(r.message_id for r in got)[-1] == "m3" or \
        len(got) == 2  # exactly the control row + one Carol survivor
    assert len(got) == 2


def test_streaming_cross_batch_dedup_mode_mismatch_fails_loudly(
        spark, tmp_path_factory):
    """A sink previously written by the DEFAULT per-batch mode has no
    _key column; pointing cross_batch_dedup=True at it must raise (a
    mode mismatch), not silently disable dedup — the failure the old
    broad except-AnalysisException used to swallow."""
    import json as _json

    from pyspark.errors import StreamingQueryException

    from project_discord_knowledge_graph_spark.streaming.stream import (
        stream_discord_exports, streaming_export_triples,
    )

    base = tmp_path_factory.mktemp("mode_mismatch")
    land = base / "landing"
    land.mkdir()
    (land / "e1.json").write_text(_json.dumps({
        "channel": {"id": "c", "name": "alerts"},
        "messages": [
            {"id": "m1", "timestamp": "2024-01-02T03:00:00Z",
             "content": "alert: fomc meeting starts in 1 hour",
             "author": {"id": "a1", "name": "Alice"}}]}))

    out = str(base / "out")
    # write the sink in default (per-batch) mode -> rows lack _key
    msgs = stream_discord_exports(spark, str(land))
    q = streaming_export_triples(msgs, out, str(base / "ckpt1"))
    q.awaitTermination(120)
    assert "_key" not in spark.read.parquet(out).columns

    # now a cross-batch-dedup stream against the same sink: loud fail
    msgs2 = stream_discord_exports(spark, str(land))
    q2 = streaming_export_triples(msgs2, out, str(base / "ckpt2"),
                                  cross_batch_dedup=True)
    with pytest.raises(StreamingQueryException, match="_key"):
        q2.awaitTermination(120)


def test_stateful_semantic_links(spark, tmp_path_factory):
    """semantic=True: (a) within one micro-batch the emitted semantic
    link set — pairs AND confidences — equals the batch J3 join
    (link_by_similarity on precomputed vectors, identical admission
    predicate); (b) a question's vector survives in state so an
    answer in a LATER batch still links semantically."""
    import json as _json
    import os as _os

    from project_discord_knowledge_graph_spark.operators.link import (
        link_by_similarity, split_qa,
    )
    from project_discord_knowledge_graph_spark.streaming.stream import (
        stateful_link_qa,
    )

    import zlib

    def vec(t):
        # crc32, not builtin hash(): PYTHONHASHSEED varies per process
        # and a collision-heavy 16-dim space made "dissimilar" text
        # clear the 0.3 threshold on some seeds
        v = [0.0] * 64
        for w in (t or "").split():
            v[zlib.crc32(w.encode()) % 64] += 1.0
        return v

    rows = [
        # q1 at 10:00; a1 similar @+5min (links), a2 similar @+30min
        # (outside window), a3 dissimilar @+6min (below threshold)
        ("q1", "seg", "alice", "2024-01-01T10:00:00+00:00", "question",
         None, [], "how do i size the wheel on tqqq?"),
        ("a1", "seg", "bob", "2024-01-01T10:05:00+00:00", "answer",
         None, [], "size the wheel on tqqq small, scale in slowly"),
        ("a2", "seg", "carol", "2024-01-01T10:30:00+00:00", "answer",
         None, [], "size the wheel on tqqq small"),
        ("a3", "seg", "dan", "2024-01-01T10:06:00+00:00", "answer",
         None, [], "coffee break chat totally unrelated words here"),
    ]
    cols = ("message_id string, segment_id string, author string, "
            "timestamp string, type string, reply_to string, "
            "mentions array<string>, clean_text string")

    # batch ground truth: J3 on precomputed vectors
    msgs = (spark.createDataFrame(rows, cols)
            .withColumn("warc_ts", F.col("timestamp").cast("timestamp")))
    questions, answers = split_qa(msgs, include_text=True)
    vec_rows = [(r[0], vec(r[7])) for r in rows]
    vecs = spark.createDataFrame(vec_rows,
                                 "message_id string, v array<double>")
    q = questions.join(vecs.selectExpr("message_id q_id", "v q_vec"),
                       "q_id")
    a = answers.join(vecs.selectExpr("message_id a_id", "v a_vec"),
                     "a_id")
    want = {(r.subject, r.object): r.confidence
            for r in link_by_similarity(q, a).collect()}
    assert set(want) == {("q1", "a1")}

    # streaming, all four rows in ONE batch -> identical link set
    base = tmp_path_factory.mktemp("sem_links")
    names = ["segment_id", "message_id", "type", "author", "mentions",
             "reply_to", "timestamp", "vec"]

    def write_file(path, which):
        with open(path, "w") as f:
            for r in rows:
                if r[0] not in which:
                    continue
                rec = dict(zip(names, (r[1], r[0], r[4], r[2], r[6],
                                       r[5], r[3], vec(r[7]))))
                f.write(_json.dumps(rec) + "\n")

    schema = ("segment_id string, message_id string, type string, "
              "author string, mentions array<string>, reply_to string, "
              "timestamp string, vec array<double>")

    def drain(land, out, ckpt):
        stream = spark.readStream.schema(schema) \
            .option("maxFilesPerTrigger", "1").json(str(land))
        sem = stateful_link_qa(stream, semantic=True)
        q_ = run_available_now(sem, str(out), str(ckpt))
        q_.awaitTermination(120)
        return spark.read.parquet(str(out))

    land1 = base / "land1"
    land1.mkdir()
    write_file(land1 / "f0.jsonl", {"q1", "a1", "a2", "a3"})
    got = {(r.subject, r.object): r.confidence
           for r in drain(land1, base / "out1", base / "ckpt1")
           .where(F.col("message_id").contains("_semantic_"))
           .collect()}
    assert got == want   # same pair, bit-identical confidence

    # cross-batch: question lands in file 1, similar answer in file 2
    land2 = base / "land2"
    land2.mkdir()
    write_file(land2 / "f0.jsonl", {"q1"})
    write_file(land2 / "f1.jsonl", {"a1"})
    _os.utime(land2 / "f0.jsonl", (1_700_000_000, 1_700_000_000))
    _os.utime(land2 / "f1.jsonl", (1_700_000_100, 1_700_000_100))
    got2 = {(r.subject, r.object): r.confidence
            for r in drain(land2, base / "out2", base / "ckpt2")
            .where(F.col("message_id").contains("_semantic_"))
            .collect()}
    assert got2 == want  # state carried the vector across batches

    # without a vec column, semantic=True refuses
    with pytest.raises(ValueError, match="vec"):
        stateful_link_qa(msgs.select(
            "segment_id", "message_id", "type", "author", "mentions",
            "reply_to", "timestamp"), semantic=True)


def test_semantic_flag_flip_keeps_checkpoint(spark, tmp_path_factory):
    """The state schema is mode-independent (q_vecs always carried),
    so flipping `semantic` against an EXISTING checkpoint restarts
    cleanly instead of dying on state deserialization: off->on keeps
    old questions linkable by reply (they carry no vector), and the
    on-run's semantic links work; on->off restarts cleanly again."""
    import json as _json
    import os as _os
    import zlib

    from project_discord_knowledge_graph_spark.streaming.stream import (
        stateful_link_qa,
    )

    def vec(t):
        v = [0.0] * 64
        for w in (t or "").split():
            v[zlib.crc32(w.encode()) % 64] += 1.0
        return v

    base = tmp_path_factory.mktemp("sem_flip")
    land = base / "land"
    land.mkdir()
    out, ckpt = str(base / "out"), str(base / "ckpt")
    schema = ("segment_id string, message_id string, type string, "
              "author string, mentions array<string>, reply_to string, "
              "timestamp string, vec array<double>")

    def write_file(name, recs, mtime):
        p = land / name
        with open(p, "w") as f:
            for r in recs:
                f.write(_json.dumps(r) + "\n")
        _os.utime(p, (mtime, mtime))

    def drain(semantic):
        stream = spark.readStream.schema(schema) \
            .option("maxFilesPerTrigger", "1").json(str(land))
        if not semantic:
            stream = stream.drop("vec")
        q_ = run_available_now(
            stateful_link_qa(stream, semantic=semantic), out, ckpt)
        q_.awaitTermination(120)
        return spark.read.parquet(out).collect()

    def rec(mid, typ, author, ts, text, reply_to=None):
        return {"segment_id": "seg", "message_id": mid, "type": typ,
                "author": author, "mentions": [], "reply_to": reply_to,
                "timestamp": ts, "vec": vec(text)}

    # batch 1, semantic OFF: register q1 (no vector captured)
    write_file("f0.jsonl", [
        rec("q1", "question", "alice", "2024-01-01T10:00:00+00:00",
            "how do i size the wheel on tqqq?")], 1_700_000_000)
    assert drain(semantic=False) == []

    # flip ON against the same checkpoint: restart is clean; a1
    # reply-links to the off-mode question (state survived), but no
    # semantic link (q1 carries an empty vector by design)
    write_file("f1.jsonl", [
        rec("a1", "answer", "bob", "2024-01-01T10:02:00+00:00",
            "size the wheel on tqqq small, scale in slowly",
            reply_to="q1")], 1_700_000_100)
    rows = drain(semantic=True)
    assert {(r.subject, r.object, r.confidence) for r in rows} == \
        {("q1", "a1", 0.95)}

    # still ON: a question+answer pair registered IN semantic mode
    # does link semantically through the same checkpoint
    write_file("f2.jsonl", [
        rec("q2", "question", "carol", "2024-01-01T10:10:00+00:00",
            "what size for the wheel on spy today?")], 1_700_000_200)
    write_file("f3.jsonl", [
        rec("a2", "answer", "dan", "2024-01-01T10:12:00+00:00",
            "the wheel size for spy today should stay small")],
        1_700_000_300)
    rows = drain(semantic=True)
    sem = [r for r in rows if "_semantic_" in r.message_id]
    assert {(r.subject, r.object) for r in sem} == {("q2", "a2")}

    # flip back OFF: clean restart again, no new links from a
    # mention-free chat message
    write_file("f4.jsonl", [
        rec("m1", "discussion", "eve", "2024-01-01T10:14:00+00:00",
            "lol unrelated chatter")], 1_700_000_400)
    n_before = len(rows)
    assert len(drain(semantic=False)) == n_before
