"""LLM extraction path: token heuristic, batch splitting, provider
plumbing with a deterministic fake."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_discord_knowledge_graph_spark.operators.llm_extract import (
    cost_summary, estimate_tokens, extract_with_llm, split_by_token_limit,
)


def test_estimate_tokens_heuristic():
    assert estimate_tokens("") == 0
    # 350 chars, 1 word -> char-based dominates: 350/3.5 * 1.1 = 110
    assert estimate_tokens("x" * 350) == 110
    # many short words -> word-based dominates: 100 * 1.3 * 1.1 = 143
    assert estimate_tokens("a " * 100) == 143


def test_split_by_token_limit():
    texts = ["word " * 200] * 7  # ~314 tokens each + 10 overhead
    batches = split_by_token_limit(texts, target_tokens=900)
    assert [len(b) for b in batches] == [2, 2, 2, 1]
    assert [i for b in batches for i in b] == list(range(7))
    assert split_by_token_limit([], 100) == []
    # a single over-limit text still forms a batch of one
    assert split_by_token_limit(["x" * 99999], 100) == [[0]]


@pytest.fixture()
def msgs(spark):
    rows = [
        ("m1", "segA", "2024-01-01T10:00:00+00:00", "alice",
         "buy tqqq " * 50),
        ("m2", "segA", "2024-01-01T10:01:00+00:00", "bob",
         "sell spy " * 50),
        ("m3", "segB", "2024-01-01T11:00:00+00:00", "carol",
         "hold btc"),
    ]
    return spark.createDataFrame(
        rows, ["message_id", "segment_id", "timestamp", "author",
               "clean_text"])


def test_extract_with_llm_fake_provider(spark, msgs):
    def fake_provider(batch):
        # one triple per message in the batch; one invalid confidence
        out = []
        for m in batch:
            word = m["clean_text"].split()[0]
            out.append((m["author"], "llm_mentions", word, 7.5
                        if word == "hold" else 0.9))
        return out

    got = extract_with_llm(msgs, provider=fake_provider,
                           target_tokens=200)
    rows = {r.object: r for r in got.collect()}
    assert set(rows) == {"buy", "sell", "hold"}
    assert rows["hold"].confidence == 0.5       # clamp fallback
    assert rows["buy"].extraction_method == "llm"
    assert rows["buy"].batch_tokens > 0
    # segA's messages are large -> separate token batches
    seg_a = [r for r in rows.values() if r.segment_id == "segA"]
    assert len({r.batch_tokens for r in seg_a}) >= 1

    costs = {r.segment_id: r for r in cost_summary(got).collect()}
    assert costs["segA"].n_triples == 2
    assert costs["segB"].est_tokens > 0


def test_extract_with_llm_requires_provider(spark, msgs):
    with pytest.raises(NotImplementedError):
        extract_with_llm(msgs)


def test_attribute_triples_composes_with_llm_output(spark):
    """J6 must accept extract_with_llm-shaped outputs (which already
    carry message_id/timestamp batch stamps) and REPLACE those fields
    with the matched message's values — no ambiguous columns."""
    from project_discord_knowledge_graph_spark.operators.llm_extract import (
        attribute_triples,
    )
    messages = spark.createDataFrame(
        [("m1", "s1", "alice", "2024-01-01T00:00:00+00:00"),
         ("m2", "s1", "alice", "2024-01-01T00:05:00+00:00"),
         ("m3", "s1", "bob", "2024-01-01T00:01:00+00:00")],
        ["message_id", "segment_id", "author", "timestamp"])
    outputs = spark.createDataFrame(
        [("alice", "states", "x", "BATCH", "s1", "BATCHTS", 0.9),
         ("carol", "states", "y", "BATCH", "s1", "BATCHTS", 0.9)],
        ["subject", "predicate", "object", "message_id", "segment_id",
         "timestamp", "confidence"])
    rows = attribute_triples(outputs, messages).collect()
    assert len(rows) == 1                      # no alice-less carol
    r = rows[0]
    assert r.message_id == "m1"                # first by timestamp
    assert r.timestamp == "2024-01-01T00:00:00+00:00"
    assert r.predicate == "states" and r.confidence == 0.9


def test_llm_calls_schema_and_views(spark):
    """The full 31-column recorder schema feeds every dashboard view;
    div-by-zero ratios come back null (llm_evaluation_app.py:95-98)."""
    import datetime as dt

    from project_discord_knowledge_graph_spark.plans.llm_metrics import (
        LLM_CALLS_SCHEMA, efficiency_stats, provider_stats,
        template_stats, with_derived_ratios,
    )
    assert len(LLM_CALLS_SCHEMA.fields) == 31
    base = {f.name: None for f in LLM_CALLS_SCHEMA.fields}
    rows = []
    for i, (tokens, dur, triples) in enumerate(
            [(100, 2.0, 4), (0, 0.0, 0), (50, 1.0, 2)]):
        rows.append(dict(base, call_id=str(i),
                         timestamp=dt.datetime(2024, 1, 1),
                         provider="claude", template_type="qa",
                         success=True, parsing_success=(i != 1),
                         triples_count=triples, duration_seconds=dur,
                         total_tokens=tokens, cost_usd=0.25,
                         batch_size=2, messages_in_batch=3))
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in LLM_CALLS_SCHEMA.fields)
         for r in rows], LLM_CALLS_SCHEMA)
    ratios = {r.call_id: r for r in with_derived_ratios(df).collect()}
    assert ratios["0"].cost_per_token == 0.25 / 100
    assert ratios["1"].cost_per_token is None       # 0 tokens -> null
    assert ratios["1"].tokens_per_second is None    # 0 secs  -> null
    assert ratios["1"].cost_per_triple is None      # 0 triples -> null
    t = template_stats(df).first()
    assert t.total_calls == 3 and t.api_success_rate == 100.0
    assert t.parsing_success_rate == round(200 / 3, 2)
    p = provider_stats(df).first()
    assert p.total_tokens == 150 and p.total_cost == 0.75
    e = efficiency_stats(df).first()
    # mean over non-null cost_per_triple rows only: (0.0625+0.125)/2
    assert e.avg_cost_per_triple == 0.09375
