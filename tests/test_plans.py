"""Physical-plan audits: the properties that matter at 100 TB.

These tests pin the *plan shape*, not results: predicate pushdown to
the scan, column pruning, broadcast joins for small dims, no repeated
evaluation of the expensive pandas UDF, and the extraction pass
staying shuffle-free.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from project_discord_knowledge_graph_spark.operators.classify import (
    with_type,
)
from project_discord_knowledge_graph_spark.operators.extract import (
    extract_triples,
)
from project_discord_knowledge_graph_spark.sources.pages import (
    pages_to_messages, read_pages,
)
from project_discord_knowledge_graph_spark.sources.synth import pages_df


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "pages")
    pages_df(spark, 100, seed=5).write.parquet(p)
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_watermark_pushdown_to_scan(spark, pages_path):
    df = read_pages(spark, pages_path, after_ts="2024-01-01 01:00:00")
    plan = _plan(pages_to_messages(df))
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "warc_ts" in scan and "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*GreaterThan\(warc_ts",
                     plan)


def test_column_pruning_on_scan(spark, pages_path):
    # a query touching only html must not read text from parquet
    df = read_pages(spark, pages_path)
    msgs = pages_to_messages(df).select("message_id", "author")
    scan = next(ln for ln in _plan(msgs).splitlines() if "FileScan" in ln)
    assert "text" not in scan.split("ReadSchema")[-1]


def test_udf_evaluated_once(spark, pages_path):
    """The filter on clean_text must not duplicate the pandas UDF
    (the nondeterministic marking prevents pushdown re-eval)."""
    msgs = pages_to_messages(read_pages(spark, pages_path))
    plan = _plan(msgs)
    assert plan.count("parse_page_udf") == 1
    assert plan.count("ArrowEvalPython") == 1


def test_extraction_is_shuffle_free(spark, pages_path):
    msgs = with_type(pages_to_messages(read_pages(spark, pages_path)))
    plan = _plan(extract_triples(msgs))
    assert "Exchange" not in plan  # one narrow pass, zero shuffles


def test_tpch_q3_broadcasts_customer(spark):
    from project_discord_knowledge_graph_spark.entry_queries import q_tpch_q3
    plan = _plan(q_tpch_q3(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan


def test_classifier_stays_jvm_side(spark, pages_path):
    """C1 must compile to native RLIKE expressions inside a Project
    (zero Python evaluation beyond the single text-extraction UDF),
    and the scan must prune to the one needed column."""
    msgs = with_type(pages_to_messages(read_pages(spark, pages_path)))
    plan = _plan(msgs.groupBy("type").count())
    assert plan.count("ArrowEvalPython") == 1  # only the text UDF
    assert "RLIKE" in plan
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "ReadSchema: struct<html:binary>" in scan


def test_new_queries_have_sane_plans(spark):
    """Regression net for the round-2 operators: no cartesian
    products anywhere; the flatten and the normalizer stay narrow
    (zero exchanges)."""
    from project_discord_knowledge_graph_spark import entry_queries as EQ
    sf = "/root/testdata/sf0.001"
    # round 7: the flatten deliberately spends ONE hash-repartition
    # exchange right after the scan — the sf tables are single-row-
    # group parquet, so without it the per-row-heavy JSON round-trip
    # runs in one task (measured 5x at sf1.0).  Pin exactly one
    # exchange and that it is the repartition, not an accidental
    # join/agg shuffle.  The normalizer's per-row work measured too
    # cheap to pay for an exchange, so it stays fully narrow.
    one_repartition = {"discord_flatten"}
    narrow = {"scalar_ts_normalize"}
    for name in ("kg_prune_candidates", "discord_flatten",
                 "ann_lsh_topk", "scalar_ts_normalize",
                 "kg_attribute_outputs", "llm_template_stats"):
        fn, _sql = EQ.QUERIES[name]
        plan = _plan(fn(spark, sf))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name
        if name in one_repartition:
            n_exchange = sum("Exchange" in ln and "Reused" not in ln
                             for ln in plan.splitlines())
            assert "Exchange hashpartitioning" in plan, name
            assert n_exchange == 1, (name, plan)
        if name in narrow:
            assert "Exchange" not in plan, name


def test_mention_link_join_is_hash_equi(spark, pages_path):
    """J2's equi part (segment, author) must hash; the 10-minute
    window must be a residual condition, not a cross join."""
    from project_discord_knowledge_graph_spark.operators.link import (
        link_by_mentions, split_qa,
    )
    msgs = with_type(pages_to_messages(read_pages(spark, pages_path)))
    q, a = split_qa(msgs)
    plan = _plan(link_by_mentions(q, a))
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_aqe_skew_join_fires_on_head_link_key(spark):
    """Skew evidence for the north rule's head-entity worry: under a
    head (mention author, segment) key — one key holding ~87% of the
    exploded mention rows — the session's AQE skew-join config
    actually SPLITS the skewed partition of the J2 link join
    (SortMergeJoin(skew=true) + 'AQEShuffleRead ... skewed' in the
    EXECUTED adaptive plan, not the static one).  Thresholds are
    lowered to make the toy corpus cross the skew bar; the plan
    mechanics are identical at production sizes with the defaults."""
    from project_discord_knowledge_graph_spark.operators.link import (
        link_by_mentions,
    )

    tweaked = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    }
    saved = {}
    for k, v in tweaked.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        head = spark.range(20000).select(
            F.concat(F.lit("a"), "id").alias("a_id"),
            F.lit("s0").alias("a_segment"),
            F.lit("2024-01-02T03:05:00").alias("a_ts"),
            F.lit("2024-01-02T03:05:00").alias("a_tstamp"),
            F.lit(None).cast("string").alias("reply_to"),
            F.array(F.lit("alice")).alias("mentions"))
        tail = spark.range(3000).select(
            F.concat(F.lit("t"), "id").alias("a_id"),
            F.concat(F.lit("s"), (F.col("id") % 30 + 1)).alias(
                "a_segment"),
            F.lit("2024-01-02T03:05:00").alias("a_ts"),
            F.lit("2024-01-02T03:05:00").alias("a_tstamp"),
            F.lit(None).cast("string").alias("reply_to"),
            F.array(F.concat(F.lit("u"), F.col("id") % 97)).alias(
                "mentions"))
        questions = spark.range(10).select(
            F.concat(F.lit("q"), "id").alias("q_id"),
            F.lit("alice").alias("q_author"),
            F.lit("s0").alias("q_segment"),
            F.lit("2024-01-02T03:00:00").alias("q_ts"),
            F.lit("2024-01-02T03:00:00").alias("q_tstamp")
        ).unionByName(spark.range(97).select(
            F.concat(F.lit("qu"), "id").alias("q_id"),
            F.concat(F.lit("u"), "id").alias("q_author"),
            F.concat(F.lit("s"), (F.col("id") % 30 + 1)).alias(
                "q_segment"),
            F.lit("2024-01-02T03:00:00").alias("q_ts"),
            F.lit("2024-01-02T03:00:00").alias("q_tstamp")))
        links = link_by_mentions(questions,
                                 head.unionByName(tail))
        n = len(links.collect())
        assert n == 200_187  # 20000*10 head + 97*~31 tail matches
        plan = links._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_banded_lsh_reuses_signature_exchange(spark):
    """The banded-MinHash pair generator self-joins the bucket frame;
    the executed plan must REUSE the bucket exchange on the second
    join side instead of recomputing the (expensive) 60-min-hash
    signature scan twice, and the window's (band, sig) partitioning
    must feed the join without an extra exchange per side."""
    import re

    from pyspark.sql import functions as F

    from project_discord_knowledge_graph_spark.operators.entity import (
        lsh_candidate_pairs_banded,
    )

    mentions = spark.range(2000).select(
        F.concat(F.lit("m:"), F.md5(F.col("id").cast("string")))
         .alias("mention"),
        F.lit(1).alias("n_occurrences"))
    pairs = lsh_candidate_pairs_banded(mentions)
    pairs.collect()
    # toString() appends the pre-AQE "Initial Plan" which duplicates
    # every exchange — audit only the executed Final Plan section
    plan = (pairs._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert "ReusedExchange" in plan, plan[:2000]
    # window partitioning (band, sig) flows into the join: at most
    # one NON-reused bucket exchange in the whole executed plan
    bucket_ex = re.findall(r"\+- Exchange hashpartitioning\(band",
                           plan)
    assert len(bucket_ex) <= 1, plan[:2000]


def test_top5_window_rank_limit_pushes_down(spark):
    """q_top5_per_type windows over low-cardinality event_type; what
    saves it from a one-task-per-type full sort at scale is Spark's
    WindowGroupLimit rank pushdown: a PARTIAL top-5 per partition
    BEFORE the exchange, the Final after.  Pin both so a config or
    version regression can't silently turn the pattern back into an
    unbounded per-type sort (it was the worst sf1.0 scaler at 1.9x
    even WITH the pushdown)."""
    from project_discord_knowledge_graph_spark.entry_queries import (
        q_top5_per_type,
    )
    plan = _plan(q_top5_per_type(spark, "/root/testdata/sf0.001"))
    assert re.search(r"WindowGroupLimit .*row_number\(\), 5, Partial",
                     plan), plan
    assert re.search(r"WindowGroupLimit .*row_number\(\), 5, Final",
                     plan), plan
    # the Partial must sit BELOW the exchange (map-side): in the tree
    # rendering, upstream nodes print later
    partial_pos = plan.find("5, Partial")
    exch_pos = plan.find("Exchange hashpartitioning")
    assert 0 <= exch_pos < partial_pos, plan


def test_flatten_filter_not_pushed_below_repartition(spark):
    """The flatten's content filter embeds the whole
    from_json(to_json(...)) evaluation; entry_queries._barrier must
    keep it ABOVE the repartition exchange even when output pruning
    (a bare count) removes every other column — otherwise the JSON
    round-trip runs inside the single-task scan stage (measured ~3x
    slower at sf1.0).  Pin: the Filter sits above the
    RepartitionByExpression in the optimized plan."""
    from project_discord_knowledge_graph_spark import entry_queries as EQ
    fn, _sql = EQ.QUERIES["discord_flatten"]
    df = fn(spark, "/root/testdata/sf0.001").groupBy().count()
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    f = next(i for i, ln in enumerate(lines) if "Filter" in ln)
    r = next(i for i, ln in enumerate(lines) if "Repartition" in ln)
    assert f < r, plan
