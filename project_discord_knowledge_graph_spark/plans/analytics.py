"""Dashboard analytics views over the engine's output tables.

The reference's fourth entry-point family is three Streamlit
dashboards + a metrics app (SURVEY.md section 3): each loads
JSONL/SQLite into pandas and runs filters/groupbys.  Here they are
named DataFrame views over the triples/lineage tables — the workload
the engine must answer interactively, expressed so Catalyst pushes
the dashboard filters into the scans.

View -> reference mapping:
- predicate_histogram:   extraction/app.py:487-490
- confidence_by_predicate: extraction/app.py:789-829
- top_subjects:          ingestion/streamlit_app.py:314-324
- hourly_timeline:       llm_evaluation_dashboard/llm_evaluation_app.py:635
- segment_spread:        rule_based/test_step3.py:84-94
- run_stage_metrics:     llm_evaluation_app.py:276-380 over lineage
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def predicate_histogram(triples: DataFrame) -> DataFrame:
    return (triples.groupBy("predicate")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "predicate"))


def confidence_by_predicate(triples: DataFrame) -> DataFrame:
    return (triples.groupBy("predicate").agg(
        F.count("*").alias("n"),
        F.round(F.avg("confidence"), 4).alias("avg_conf"),
        F.round(F.min("confidence"), 4).alias("min_conf"),
        F.round(F.max("confidence"), 4).alias("max_conf"),
        F.round(F.avg((F.col("confidence") > 0.8).cast("int")), 4)
         .alias("share_high")))


def top_subjects(triples: DataFrame, k: int = 10) -> DataFrame:
    return (triples.groupBy("subject").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "subject").limit(k))


def hourly_timeline(triples: DataFrame) -> DataFrame:
    ts = F.to_timestamp("timestamp")
    return (triples
            .withColumn("hour", F.date_trunc("hour", ts))
            .groupBy("hour", "predicate")
            .agg(F.count("*").alias("n")))


def extractions_per_day(triples: DataFrame) -> DataFrame:
    """Extractions-over-time daily rollup (extraction/app.py:836-855):
    the triple's ISO timestamp string -> date bucket -> count;
    unparseable/missing timestamps are skipped exactly as the
    reference's try/except-continue.

    Date semantics follow the reference's
    fromisoformat(...).strftime('%Y-%m-%d'): the bucket is the
    stamp's OWN wall-clock date (a '+05:00' stamp near midnight stays
    on its local-calendar day), so the date comes from the string's
    leading 'YYYY-MM-DD' — never from a session-timezone conversion.
    The full-string parse is kept purely as the validity gate."""
    valid = F.try_to_timestamp(
        F.regexp_replace("timestamp", "Z$", "+00:00"))
    d = F.when(valid.isNotNull(),
               F.to_date(F.try_to_timestamp(
                   F.substring("timestamp", 1, 10))))
    return (triples.withColumn("date", d)
            .where(F.col("date").isNotNull())
            .groupBy("date").agg(F.count("*").alias("extractions")))


def segment_spread(triples: DataFrame) -> DataFrame:
    return (triples.groupBy("segment_id")
            .agg(F.count("*").alias("n_triples"),
                 F.countDistinct("predicate").alias("n_predicates"),
                 F.countDistinct("subject").alias("n_subjects")))


def compare_extraction_runs(rule: DataFrame,
                            variant: DataFrame) -> DataFrame:
    """J5/A10 named operator (extraction/app.py:918-940): per-message
    triple counts + predicate-set overlap between two extraction runs
    (rule vs LLM/variant), with the reference's disagreement flag
    (abs count diff >= 2).

    Feed it STAGED inputs: both arms read the classified messages
    table once (plans/pipeline.py build_triples stage_dir, or a
    .persist() at small scale) — recomputing the classify stage per
    arm doubles the most expensive scan at 100 TB."""
    def per_msg(t, prefix):
        return t.groupBy("message_id").agg(
            F.count("*").alias(f"n_{prefix}"),
            F.collect_set("predicate").alias(f"preds_{prefix}"))

    joined = per_msg(rule, "rule").join(per_msg(variant, "llm"),
                                        "message_id", "full_outer")
    empty = F.array().cast("array<string>")
    pr = F.coalesce("preds_rule", empty)
    pl = F.coalesce("preds_llm", empty)
    nr = F.coalesce("n_rule", F.lit(0))
    nl = F.coalesce("n_llm", F.lit(0))
    return joined.select(
        "message_id",
        nr.alias("n_rule"), nl.alias("n_llm"),
        F.size(F.array_intersect(pr, pl)).alias("n_common_preds"),
        F.size(F.array_union(pr, pl)).alias("n_all_preds"),
        (F.abs(nr - nl) >= 2).alias("disagreement"))


def run_stage_metrics(lineage: DataFrame) -> DataFrame:
    """A6-style rollup over the lineage table (replaces the SQLite
    metrics queries): per run+stage totals and timings."""
    return (lineage.groupBy("run_id", "stage").agg(
        F.count("*").alias("n_partitions"),
        F.sum("rows_in").alias("rows_in"),
        F.sum("triples_out").alias("rows_out"),
        F.sum("duration_ms").alias("total_ms"),
        F.max("warc_ts_watermark").alias("high_watermark"),
        F.round(F.avg((F.col("status") == "completed").cast("int")), 4)
         .alias("success_rate")))


ALL_VIEWS = {
    "predicate_histogram": predicate_histogram,
    "confidence_by_predicate": confidence_by_predicate,
    "top_subjects": top_subjects,
    "hourly_timeline": hourly_timeline,
    "extractions_per_day": extractions_per_day,
    "segment_spread": segment_spread,
}


def register_views(spark, triples: DataFrame,
                   lineage: DataFrame | None = None) -> None:
    """Expose every view as a SQL temp view (spark.sql-able)."""
    triples.createOrReplaceTempView("triples")
    for name, fn in ALL_VIEWS.items():
        fn(triples).createOrReplaceTempView(name)
    if lineage is not None:
        lineage.createOrReplaceTempView("lineage")
        run_stage_metrics(lineage).createOrReplaceTempView(
            "run_stage_metrics")
