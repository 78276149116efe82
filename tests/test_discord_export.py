"""S1/P1 parity: the Discord-export JSON source's 20-field flatten vs
the reference-port semantics, field by field, over a fixture that
exercises every .get-default branch."""

from __future__ import annotations

import json

import pytest

from project_discord_knowledge_graph_spark.oracle import (
    reference_port as RP,
)
from project_discord_knowledge_graph_spark.sources.discord_export import (
    export_to_messages, message_flag_stats, read_discord_export,
)

EXPORT = {
    "guild": {"id": "g1", "name": "Test Guild"},
    "channel": {"id": "c1", "name": "trading-floor", "category": "fin"},
    "messages": [
        {   # full-featured: every metadata list populated
            "id": "m1",
            "timestamp": "2024-01-02T03:04:05.123456Z",
            "content": "Check <@123> this out",
            "isPinned": True,
            "author": {"id": "a1", "name": "Alice", "isBot": True,
                       "roles": [{"id": "r1", "name": "mod"},
                                 {"id": "r2", "name": "member"}]},
            "mentions": [{"id": "u9", "name": "Bob"}, {"id": "u10"}],
            "attachments": [
                {"fileName": "chart.png", "url": "http://x/1",
                 "fileSizeBytes": 2048},
                {"fileName": "data.csv", "url": "http://x/2"}],
            "reactions": [{"emoji": {"name": "+1"}, "count": 3},
                          {"emoji": {"name": "eyes"}}],
            "reference": {"messageId": "m0"},
        },
        {   # thread message -> thread slug segment
            "id": "m2",
            "timestamp": "2024-01-02T03:10:00Z",
            "content": "In the thread",
            "author": {"id": "a2", "name": "Bob"},
            "thread": {"name": "BTC Talk!"},
        },
        {   # minimal: every default branch
            "id": "m3",
            "timestamp": "2024-01-02T04:00:00Z",
            "content": "bare message",
            "author": {"id": "a3"},
        },
        {   # whitespace-only content -> dropped (preprocessor.py:272)
            "id": "m4",
            "timestamp": "2024-01-02T04:01:00Z",
            "content": "   ",
            "author": {"id": "a4", "name": "Eve"},
        },
        {   # tab/newline-only content: Python strip() drops it too
            # (Spark trim() would not — the drop uses a (?U)\s regex)
            "id": "m8",
            "timestamp": "2024-01-02T04:02:00Z",
            "content": "\n\t  ",
            "author": {"id": "a8", "name": "Wendy"},
        },
        {   # unparseable timestamp -> quarantined ts, 'unknown' window
            "id": "m5",
            "timestamp": "yesterday-ish",
            "content": "dirty time",
            "author": {"id": "a5", "name": "Mallory"},
        },
        {   # reference with channelId -> synthetic thread name
            "id": "m6",
            "timestamp": "2024-01-02T05:00:00Z",
            "content": "reply into a thread",
            "author": {"id": "a6", "name": "Trent"},
            "reference": {"messageId": "m2", "channelId": "C9"},
        },
        {   # offset timestamp: segment window keeps the RAW wall
            # clock (23h) while the normalized instant is 21:30 UTC
            "id": "m7",
            "timestamp": "2024-01-02T23:30:00+02:00",
            "content": "offset wall clock",
            "author": {"id": "a7", "name": "Niaj"},
        },
    ],
}

FIELDS = ("message_id", "segment_id", "thread", "channel", "author",
          "timestamp", "type", "confidence", "content", "clean_text",
          "original_timestamp", "author_id", "author_roles", "mentions",
          "attachments", "reactions", "is_bot", "is_pinned", "reply_to")


@pytest.fixture(scope="module")
def flattened(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("export") / "chan.json"
    p.write_text(json.dumps(EXPORT))
    return export_to_messages(
        read_discord_export(spark, str(p))).collect()


def _normalize(v):
    if hasattr(v, "asDict"):
        return dict(v.asDict())
    if isinstance(v, list):
        return [_normalize(x) for x in v]
    return v


def test_flatten_matches_reference_port(flattened):
    want = {r["message_id"]: r for r in RP.process_export(EXPORT)}
    got = {r.message_id: r for r in flattened}
    assert set(got) == set(want) == {"m1", "m2", "m3", "m5", "m6", "m7"}
    for mid, row in got.items():
        for f in FIELDS:
            assert _normalize(row[f]) == want[mid][f], (mid, f)


def test_flatten_branch_values(flattened):
    by_id = {r.message_id: r for r in flattened}
    m1 = by_id["m1"]
    assert m1.author_roles == ["mod", "member"]
    assert m1.mentions == ["Bob", "u10"]          # name, then id fallback
    assert [a.asDict() for a in m1.attachments] == [
        {"filename": "chart.png", "url": "http://x/1", "size": 2048},
        {"filename": "data.csv", "url": "http://x/2", "size": 0}]
    assert [r.asDict() for r in m1.reactions] == [
        {"emoji": "+1", "count": 3}, {"emoji": "eyes", "count": 0}]
    assert m1.is_bot and m1.is_pinned and m1.reply_to == "m0"
    assert m1.timestamp == "2024-01-02T03:04:05.123456+00:00"
    assert m1.clean_text == "check @user123 this out"

    assert by_id["m2"].segment_id == "thread-btc-talk-"
    m3 = by_id["m3"]
    assert m3.author == "unknown" and m3.author_roles == []
    assert m3.mentions == [] and m3.attachments == []
    assert not m3.is_bot and not m3.is_pinned and m3.reply_to is None
    assert by_id["m5"].timestamp is None         # quarantined, not now()
    assert by_id["m6"].thread == "thread-C9"
    # raw wall-clock hour (23) feeds the segment hash even though the
    # normalized instant is 21:30 UTC
    assert by_id["m7"].timestamp == "2024-01-02T21:30:00+00:00"
    import hashlib
    key = "unknown-Niaj-20240102-23"
    assert by_id["m7"].segment_id == \
        "segment-" + hashlib.md5(key.encode()).hexdigest()[:8]


def test_export_feeds_full_pipeline(spark, tmp_path_factory):
    # the export source plugs into the same classify -> extract ->
    # link -> dedup DAG as the pages source
    from project_discord_knowledge_graph_spark.plans.pipeline import (
        build_triples_from_export,
    )
    export = {
        "channel": {"id": "c1", "name": "qa"},
        "messages": [
            {"id": "q1", "timestamp": "2024-01-02T03:00:00Z",
             "content": "what should i buy, btc or eth?",
             "author": {"id": "a1", "name": "Asker"}},
            {"id": "ans1", "timestamp": "2024-01-02T03:05:00Z",
             "content": "i would recommend btc because the longer"
                        " trend has been strong lately imho",
             "author": {"id": "a2", "name": "Helper"},
             "reference": {"messageId": "q1"}},
            {"id": "al1", "timestamp": "2024-01-02T03:06:00Z",
             "content": "alert: fomc meeting starts soon",
             "author": {"id": "a3", "name": "Botty", "isBot": True}},
        ],
    }
    p = tmp_path_factory.mktemp("exp2") / "qa.json"
    p.write_text(json.dumps(export))
    triples = build_triples_from_export(spark, str(p))
    preds = {r.predicate for r in triples.collect()}
    assert "asks_about" in preds
    assert "alerts" in preds
    # the reply link survives only when q and a share a segment; both
    # messages fall in the same author-less hour window check instead:
    assert triples.count() >= 3


MALFORMED_EXPORT = {
    "channel": {"id": "c2", "name": "mixed-bag"},
    "messages": [
        {   # bare-string / number / bool roles+mentions, junk in
            # attachments/reactions (preprocessor.py:54-57, 64-65,
            # 68-75, 78-84 tolerant branches)
            "id": "x1",
            "timestamp": "2024-01-02T03:04:05Z",
            "content": "mixed shapes",
            "author": {"id": "a1", "name": "Alice",
                       "roles": ["admin", 7, True,
                                 {"id": "r1", "name": "mod"},
                                 {"id": "r2"}]},
            "mentions": ["bob", 42, {"id": "u9"},
                         {"id": "u10", "name": "Carol"}],
            "attachments": ["junk", {"fileName": "f.png",
                                     "url": "http://x/9",
                                     "fileSizeBytes": 5}, 3],
            "reactions": [{"emoji": {"name": "+1"}, "count": 2}, "bad"],
        },
        {   # well-formed message must pass the repair door unchanged
            "id": "x2",
            "timestamp": "2024-01-02T03:10:00Z",
            "content": "normal one",
            "author": {"id": "a2", "name": "Bob", "isBot": True,
                       "roles": [{"id": "r3", "name": "member"}]},
            "reference": {"messageId": "x1"},
        },
        {   # whitespace-only content still dropped after repair
            "id": "x3",
            "timestamp": "2024-01-02T03:11:00Z",
            "content": " \t ",
            "author": {"id": "a3", "name": "Eve"},
        },
    ],
}


def test_repaired_export_matches_reference_port(spark, tmp_path_factory):
    from project_discord_knowledge_graph_spark.sources.discord_export \
        import read_discord_export_repaired
    p = tmp_path_factory.mktemp("malformed") / "chan.json"
    p.write_text(json.dumps(MALFORMED_EXPORT))
    got = {r.message_id: r for r in export_to_messages(
        read_discord_export_repaired(spark, str(p))).collect()}
    want = {r["message_id"]: r
            for r in RP.process_export(MALFORMED_EXPORT)}
    assert set(got) == set(want) == {"x1", "x2"}
    for mid, row in got.items():
        for f in FIELDS:
            assert _normalize(row[f]) == want[mid][f], (mid, f)
    # spot-check the repaired shapes explicitly
    x1 = got["x1"]
    assert x1.author_roles == ["admin", "7", "True", "mod", ""]
    assert x1.mentions == ["bob", "42", "u9", "Carol"]
    assert [a.asDict() for a in x1.attachments] == [
        {"filename": "f.png", "url": "http://x/9", "size": 5}]
    assert [r.asDict() for r in x1.reactions] == [
        {"emoji": "+1", "count": 2}]


def test_repair_fuzz_parity(spark, tmp_path_factory):
    """Fuzz parity for the repair door: 40 random export documents
    with randomly malformed roles/mentions/attachments/reactions
    (bare strings, ints, bools, partial dicts, empty lists, dirty
    timestamps) through read_discord_export_repaired must match the
    behavioral port field by field.  Explicit-null field VALUES are
    excluded by construction — that is the documented columnar-schema
    deviation, tested separately."""
    import random

    from project_discord_knowledge_graph_spark.sources.discord_export \
        import read_discord_export_repaired

    rng = random.Random(4242)

    def junk_role():
        return rng.choice([
            "admin", "mod x", 7, -3, True, False,
            {"id": "r1", "name": "member"},
            {"id": "r2"}, {"name": "vip"}, {}])

    def junk_mention():
        return rng.choice([
            "bob", 42, True, {"id": "u9"},
            {"id": "u1", "name": "Carol"}, {"name": "Dave"}, {}])

    def junk_attachment():
        return rng.choice([
            "junk", 5, False,
            {"fileName": "f.png", "url": "u", "fileSizeBytes": 7},
            {"url": "only-url"}, {"fileName": "nameonly.csv"}, {}])

    def junk_reaction():
        return rng.choice([
            "bad", 9, {"emoji": {"name": "+1"}, "count": 2},
            {"emoji": {"name": "eyes"}}, {"count": 4}, {}])

    def gen_doc(d):
        msgs = []
        for i in range(rng.randrange(3, 7)):
            ts = rng.choice([
                "2024-01-02T03:04:05Z", "2024-01-02T03:04:05.123456Z",
                "2024-01-02 03:04:05", "yesterday-ish", "",
                "2024-01-02T23:30:00+02:00"])
            m = {"id": f"d{d}m{i}",
                 "timestamp": ts,
                 "content": rng.choice(
                     ["hello world", "what now?", "  ", "x" * 60]),
                 "author": {"id": f"a{i}", "name": f"user{i % 3}"}}
            if rng.random() < 0.8:
                m["author"]["roles"] = [junk_role()
                                        for _ in range(rng.randrange(4))]
            if rng.random() < 0.7:
                m["mentions"] = [junk_mention()
                                 for _ in range(rng.randrange(4))]
            if rng.random() < 0.6:
                m["attachments"] = [junk_attachment()
                                    for _ in range(rng.randrange(3))]
            if rng.random() < 0.6:
                m["reactions"] = [junk_reaction()
                                  for _ in range(rng.randrange(3))]
            if rng.random() < 0.4:
                m["reference"] = {"messageId": f"d{d}m{max(0, i - 1)}"}
            if rng.random() < 0.3:
                m["thread"] = {"name": f"T {d}!{i}"}
            msgs.append(m)
        return {"channel": {"id": f"c{d}", "name": f"chan-{d}"},
                "messages": msgs}

    docs = [gen_doc(d) for d in range(40)]
    land = tmp_path_factory.mktemp("repair_fuzz")
    for d, doc in enumerate(docs):
        (land / f"e{d}.json").write_text(json.dumps(doc))

    got = {r.message_id: r for r in export_to_messages(
        read_discord_export_repaired(spark, str(land))).collect()}
    want = {}
    for doc in docs:
        for r in RP.process_export(doc):
            want[r["message_id"]] = r
    assert set(got) == set(want) and len(want) > 80
    for mid, row in got.items():
        for f in FIELDS:
            assert _normalize(row[f]) == want[mid][f], (mid, f)


def test_repair_drops_unparseable_documents(spark, tmp_path_factory):
    from project_discord_knowledge_graph_spark.sources.discord_export \
        import read_discord_export_repaired
    d = tmp_path_factory.mktemp("broken")
    (d / "good.json").write_text(json.dumps(MALFORMED_EXPORT))
    (d / "bad.json").write_text("{not json at all")
    msgs = export_to_messages(
        read_discord_export_repaired(spark, str(d)))
    assert {r.message_id for r in msgs.collect()} == {"x1", "x2"}


def test_message_flag_stats(spark, flattened):
    df = spark.createDataFrame(flattened)
    row = message_flag_stats(df).first()
    assert row.total_messages == 6
    assert row.bot_messages == 1
    assert row.pinned_messages == 1
    assert row.with_attachments == 1
    assert row.total_reactions == 3
    assert row.with_threads == 2
    assert row.unique_authors == 6
