from __future__ import annotations

from pyspark.sql import functions as F

from project_discord_knowledge_graph_spark.operators.classify import (
    classifier_segment_id_expr, classify_expr, classify_udf_variant,
)


def test_classifier_segment_id_scheme(spark):
    df = spark.createDataFrame(
        [("general", "alice", None), ("dev", "bob", "My Thread!x")],
        "channel string, author string, thread string")
    got = {r.channel: r.seg for r in df.select(
        "channel",
        classifier_segment_id_expr(F.col("channel"), F.col("author"),
                                   F.col("thread")).alias("seg")).collect()}
    assert got["general"] == "channel-general-alice"
    # narrower class keeps '-' and replaces space/'!' (classifier.py:116)
    assert got["dev"] == "thread-My-Thread-x"


def test_classify_udf_variant_matches_native(spark):
    texts = ["made +5% profit", "alert: fomc", "what now?",
             "my plan is a trade", "outlook is sideways",
             "x" * 60, "short", ""]
    df = spark.createDataFrame([(t,) for t in texts], ["clean_text"])
    rows = df.select(
        classify_expr(F.col("clean_text")).alias("native"),
        classify_udf_variant()(F.col("clean_text")).alias("pyre")).collect()
    for r in rows:
        assert r.native == r.pyre
