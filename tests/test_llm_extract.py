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
