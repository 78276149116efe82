"""JSONL round-trip, semantic linker (J3), zero-shot plumbing (C2)."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from project_discord_knowledge_graph_spark.operators.classify import (
    classify_zero_shot,
)
from project_discord_knowledge_graph_spark.operators.link import (
    link_by_similarity, link_qa, split_qa,
)
from project_discord_knowledge_graph_spark.sources.jsonl import (
    read_jsonl, write_jsonl,
)


def test_jsonl_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [("α-entity", "asks_about", None, 0.85),
         ("user2", "alerts", "über-alert ✓", 0.8)],
        ["subject", "predicate", "object", "confidence"])
    out = str(tmp_path / "triples_jsonl")
    write_jsonl(df, out)

    import glob
    lines = []
    for f in sorted(glob.glob(f"{out}/part-*")):
        lines += open(f, encoding="utf-8").read().splitlines()
    objs = sorted((json.loads(ln) for ln in lines),
                  key=lambda o: o["subject"])
    # nulls kept, utf-8 unescaped, field order preserved
    assert objs[1]["object"] is None
    assert objs[0]["object"] == "über-alert ✓"
    assert list(objs[0].keys()) == ["subject", "predicate", "object",
                                    "confidence"]
    assert "\\u" not in lines[0] + lines[1]

    back = read_jsonl(spark, out)
    assert back.count() == 2


@pytest.fixture()
def qa_messages(spark):
    rows = [
        # same segment, q then close/far answers
        ("q1", "seg", "alice", "2024-01-01T10:00:00+00:00",
         "2024-01-01 10:00:00", "question", None, [],
         "how do i size the wheel on tqqq?"),
        ("a1", "seg", "bob", "2024-01-01T10:05:00+00:00",
         "2024-01-01 10:05:00", "answer", None, [],
         "size the wheel on tqqq small, scale in slowly"),
        ("a2", "seg", "carol", "2024-01-01T10:30:00+00:00",
         "2024-01-01 10:30:00", "answer", None, [],
         "size the wheel on tqqq small"),  # outside 10-min window
        ("a3", "seg", "dan", "2024-01-01T10:06:00+00:00",
         "2024-01-01 10:06:00", "answer", None, [],
         "coffee break chat totally unrelated words here"),
    ]
    schema = ("message_id string, segment_id string, author string, "
              "timestamp string, ts_str string, type string, "
              "reply_to string, mentions array<string>, clean_text string")
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("warc_ts", F.col("ts_str").cast("timestamp")) \
             .drop("ts_str")


def test_semantic_linker_with_injected_embedder(spark, qa_messages):
    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        # deterministic bag-of-words hash embedder
        def vec(t):
            v = [0.0] * 16
            for w in (t or "").split():
                v[hash(w) % 16] += 1.0
            return v
        return texts.map(vec)

    questions, answers = split_qa(qa_messages, include_text=True)
    links = link_by_similarity(questions, answers, embed_udf=embed,
                               threshold=0.3)
    got = {(r.subject, r.object): r.confidence for r in links.collect()}
    assert ("q1", "a1") in got          # similar + inside window
    assert ("q1", "a2") not in got      # outside 10-minute window
    assert ("q1", "a3") not in got      # dissimilar text
    assert 0.3 < got[("q1", "a1")] <= 1.0  # confidence = cosine

    # composite: include_semantic threads the embedder through
    all_links = link_qa(qa_messages, include_semantic=True,
                        embed_udf=embed)
    methods = {r.message_id.split("_")[1] for r in all_links.collect()}
    assert "semantic" in methods


def test_zero_shot_plumbing_with_fake_model(spark):
    df = spark.createDataFrame(
        [("m1", "buy the dip"), ("m2", ""), ("m3", "what now?")],
        ["message_id", "clean_text"])

    def fake_infer(texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({
            "label": ["signal" if "buy" in t else "question"
                      for t in texts],
            "score": [0.9] * len(texts),
        })

    out = {r.message_id: (r.type, r.confidence)
           for r in classify_zero_shot(df, infer_fn=fake_infer).collect()}
    assert out["m1"] == ("signal", 0.9)
    assert out["m2"] == ("alert", 0.5)   # empty-text default
    assert out["m3"] == ("question", 0.9)

    with pytest.raises(NotImplementedError):
        classify_zero_shot(df)


def test_semantic_linker_lsh_blocked_recall(spark):
    """J3 scale path: the LSH-blocked semantic linker must (a) admit
    ONLY pairs the exact segment-bounded join admits (blocking prunes,
    never invents), (b) recover >= 0.9 of them with Hamming-1 probing
    on a clustered embedding space, and (c) respect the segment bound
    (identical vectors in different segments never link)."""
    import hashlib
    import math

    from project_discord_knowledge_graph_spark.operators.link import (
        link_by_similarity_lsh,
    )

    def unit(seed, dim=64):
        v, i = [], 0
        while len(v) < dim:
            h = hashlib.md5(f"{seed}:{i}".encode()).digest()
            v.extend(b / 255.0 - 0.5 for b in h)
            i += 1
        v = v[:dim]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    q_rows, a_rows = [], []
    for c in range(20):
        center = unit(f"c{c}")
        # question vector = center + small noise; its segment ALTERNATES
        # between s0 and s1 so cross-segment leakage would be caught by
        # comparing against the exact join (which enforces the bound)
        seg = f"s{c % 2}"
        qv = [x + 0.1 * y for x, y in zip(center, unit(f"qn{c}"))]
        q_rows.append((f"q{c}", f"author{c}", seg,
                       "2024-01-02T03:00:00", "2024-01-02T03:00:00",
                       qv))
        for j in range(5):
            av = [x + 0.15 * y
                  for x, y in zip(center, unit(f"an{c}:{j}"))]
            a_rows.append((f"a{c}_{j}", seg, "2024-01-02T03:04:00",
                           "2024-01-02T03:04:00", None, [], av))
    questions = spark.createDataFrame(
        q_rows, ("q_id string, q_author string, q_segment string, "
                 "q_ts string, q_tstamp string, q_vec array<double>"))
    answers = spark.createDataFrame(
        a_rows, ("a_id string, a_segment string, a_ts string, "
                 "a_tstamp string, reply_to string, "
                 "mentions array<string>, a_vec array<double>"))

    exact = {(r.subject, r.object)
             for r in link_by_similarity(questions, answers).collect()}
    approx = {(r.subject, r.object)
              for r in link_by_similarity_lsh(
                  questions, answers, n_planes=4, dim=64,
                  probe_hamming=1).collect()}
    assert len(exact) >= 50  # in-cluster pairs clear the 0.3 threshold
    assert approx <= exact   # blocking never admits a new pair
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(approx))

    # requires the production precomputed-vector shape
    with pytest.raises(ValueError, match="q_vec"):
        link_by_similarity_lsh(questions.drop("q_vec"), answers)


def test_semantic_linker_zero_norm_vector_no_crash(spark, qa_messages):
    """Review regression: under the ANSI-on session a bare cosine
    division raises DIVIDE_BY_ZERO on a zero-norm vector (an empty
    text through a count-style embedder).  cosine_expr must yield
    NULL instead — no link, no crash — matching the stateful
    streaming linker's zero-norm skip."""
    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        def vec(t):
            v = [0.0] * 8
            for w in (t or "").split():
                if t != "":  # 'a3' gets the zero vector below
                    v[len(w) % 8] += 1.0
            return v
        return texts.map(vec)

    from project_discord_knowledge_graph_spark.operators.link import (
        link_by_similarity, split_qa,
    )

    # force a3's text empty -> zero vector on the answer side
    msgs = qa_messages.withColumn(
        "clean_text",
        F.when(F.col("message_id") == "a3", F.lit(""))
        .otherwise(F.col("clean_text")))
    questions, answers = split_qa(msgs, include_text=True)
    links = link_by_similarity(questions, answers, embed_udf=embed,
                               threshold=0.3)
    got = {(r.subject, r.object) for r in links.collect()}  # no raise
    assert not any(o == "a3" for _, o in got)
