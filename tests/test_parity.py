"""End-to-end parity: Spark pipeline vs pure-Python oracle port.

The BASELINE gate is triple P/R >= 0.95 vs the reference on the
synthetic corpus; these tests assert P/R == 1.0 on the (subject,
predicate, object) set plus full-row agreement including confidence,
message/segment ids and timestamps.
"""

from __future__ import annotations

import pytest

from project_discord_knowledge_graph_spark.oracle import reference_port as ref
from project_discord_knowledge_graph_spark.plans.pipeline import build_triples
from project_discord_knowledge_graph_spark.sources.synth import (
    gen_messages, messages_for_oracle, pages_df,
)

N = 400


@pytest.fixture(scope="module")
def corpus():
    return gen_messages(N, seed=42)


@pytest.fixture(scope="module")
def oracle_triples(corpus):
    return ref.run_from_raw(messages_for_oracle(corpus))


@pytest.fixture(scope="module")
def spark_triples(spark, corpus):
    pages = pages_df(spark, N, seed=42)
    rows = build_triples(pages).collect()
    return [r.asDict() for r in rows]


def _spo(triples):
    return {(t["subject"], t["predicate"], t["object"]) for t in triples}


def test_corpus_is_nontrivial(oracle_triples):
    preds = {t["predicate"] for t in oracle_triples}
    assert len(oracle_triples) > 200
    # every major predicate family must be exercised
    for p in ("asks_about", "provides_info", "alerts", "recommends",
              "reports_return", "analyzes", "answered_by"):
        assert p in preds, f"corpus never produces {p}"


def test_spo_precision_recall(oracle_triples, spark_triples):
    o, s = _spo(oracle_triples), _spo(spark_triples)
    inter = o & s
    precision = len(inter) / len(s)
    recall = len(inter) / len(o)
    assert precision == 1.0, f"false triples: {sorted(s - o)[:10]}"
    assert recall == 1.0, f"missed triples: {sorted(o - s)[:10]}"


def test_full_row_parity(oracle_triples, spark_triples):
    def key(t):
        return (t["subject"], t["predicate"], t["object"], t["message_id"],
                t["segment_id"], t["timestamp"],
                round(float(t["confidence"]), 6))
    o, s = {key(t) for t in oracle_triples}, {key(t) for t in spark_triples}
    assert o == s, (f"row diff: only_oracle={sorted(o - s)[:5]} "
                    f"only_spark={sorted(s - o)[:5]}")


def test_byte_identical_extracted_text(spark, corpus):
    """BASELINE invariant: byte-identical extracted text per url."""
    from pyspark.sql import functions as F
    from project_discord_knowledge_graph_spark.functions.html import (
        extract_text_udf,
    )
    pages = pages_df(spark, N, seed=42)
    bad = (pages
           .withColumn("extracted", extract_text_udf(F.col("html")))
           .where(F.col("extracted") != F.col("text"))
           .count())
    assert bad == 0


def test_fused_classify_matches_with_type(spark):
    """classify_pages' parse-UDF-fused classification (r07) is
    row-identical — schema included — to the former
    with_type(pages_to_messages(...)) formulation."""
    from project_discord_knowledge_graph_spark.operators.classify import (
        with_type,
    )
    from project_discord_knowledge_graph_spark.sources.pages import (
        pages_to_messages,
    )
    pages = pages_df(spark, N, seed=42)
    old = with_type(pages_to_messages(pages))
    new = pages_to_messages(pages, classify=True)
    assert old.schema == new.schema
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0
