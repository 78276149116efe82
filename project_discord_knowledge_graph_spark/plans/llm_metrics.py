"""llm_calls analytics: the per-call record + the dashboards' rollups.

The reference records one row per LLM API call in SQLite
(llm_powered/llm_call_recorder.py:180-228) and analyzes them in the
evaluation dashboard (discord_data/llm_evaluation_dashboard/
llm_evaluation_app.py).  Here the same surface is a parquet/Iceberg
table with native DataFrame views:

- LLM_CALLS_SCHEMA: the recorder's column set (the 31 analytic
  columns of the dashboard's SELECT, llm_evaluation_app.py:35-69).
- with_derived_ratios: cost_per_token / tokens_per_second /
  cost_per_triple with div-by-zero -> null (the dashboard's
  `.replace(0, np.nan)` trick, llm_evaluation_app.py:96-98, 604).
- template_stats / provider_stats: the groupby rollups of
  llm_evaluation_app.py:374-397 and :453-476 (counts, success rates,
  mean duration/cost/tokens/triples/batch sizes).
- efficiency_stats: mean cost-per-triple by (provider, template_type)
  (llm_evaluation_app.py:607-612).

Scale note: every view is a single hash aggregate over the calls
table; rates come from integer sums (exact, order-independent), so
the views are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StringType, StructField,
    StructType, TimestampType,
)

LLM_CALLS_SCHEMA = StructType([
    StructField("call_id", StringType(), False),
    StructField("timestamp", TimestampType(), True),
    StructField("experiment_name", StringType(), True),
    StructField("messages", StringType(), True),        # JSON blob
    StructField("message_types", StringType(), True),   # JSON blob
    StructField("batch_size", LongType(), True),
    StructField("messages_in_batch", LongType(), True),
    StructField("segment_id", StringType(), True),
    StructField("system_prompt", StringType(), True),
    StructField("user_prompt", StringType(), True),
    StructField("template_type", StringType(), True),
    StructField("template_name", StringType(), True),
    StructField("provider", StringType(), True),
    StructField("model_name", StringType(), True),
    StructField("temperature", DoubleType(), True),
    StructField("max_tokens", LongType(), True),
    StructField("raw_response", StringType(), True),
    StructField("parsed_triples", StringType(), True),  # JSON blob
    StructField("success", BooleanType(), True),
    StructField("error_message", StringType(), True),
    StructField("parsing_success", BooleanType(), True),
    StructField("parsing_error", StringType(), True),
    StructField("triples_count", LongType(), True),
    StructField("duration_seconds", DoubleType(), True),
    StructField("input_tokens", LongType(), True),
    StructField("output_tokens", LongType(), True),
    StructField("total_tokens", LongType(), True),
    StructField("cost_usd", DoubleType(), True),
    StructField("workflow_step", StringType(), True),
    StructField("node_name", StringType(), True),
    StructField("workflow_state", StringType(), True),
])


def _safe_div(num, den):
    """x / y with y == 0 (or null) -> null — the dashboard's
    `.replace(0, np.nan)` semantics (llm_evaluation_app.py:96-98)."""
    return F.when(den.isNotNull() & (den != 0), num / den)


def with_derived_ratios(calls: DataFrame) -> DataFrame:
    """Per-call derived columns (llm_evaluation_app.py:95-98, 604)."""
    return (calls
            .withColumn("cost_per_token",
                        _safe_div(F.col("cost_usd"),
                                  F.col("total_tokens")))
            .withColumn("tokens_per_second",
                        _safe_div(F.col("total_tokens"),
                                  F.col("duration_seconds")))
            .withColumn("cost_per_triple",
                        _safe_div(F.col("cost_usd"),
                                  F.col("triples_count"))))


def _rate(flag_col: str):
    """sum(flag)/count * 100, rounded 2 — integer sums keep it exact
    and order-independent."""
    return F.round(
        F.sum(F.col(flag_col).cast("int")) * 100.0 / F.count("*"), 2)


def template_stats(calls: DataFrame) -> DataFrame:
    """llm_evaluation_app.py:374-397."""
    return calls.groupBy("template_type").agg(
        F.count("*").alias("total_calls"),
        F.sum(F.col("success").cast("int")).alias("api_successful"),
        F.sum(F.col("parsing_success").cast("int"))
         .alias("parsing_successful"),
        F.round(F.avg("duration_seconds"), 4).alias("avg_duration"),
        F.round(F.avg("cost_usd"), 4).alias("avg_cost"),
        F.round(F.sum("cost_usd"), 4).alias("total_cost"),
        F.round(F.avg("total_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("triples_count"), 4).alias("avg_triples"),
        F.round(F.avg("batch_size"), 4).alias("avg_batch_size"),
        F.round(F.avg("messages_in_batch"), 4)
         .alias("avg_messages_in_batch"),
        _rate("success").alias("api_success_rate"),
        _rate("parsing_success").alias("parsing_success_rate"),
    )


def provider_stats(calls: DataFrame) -> DataFrame:
    """llm_evaluation_app.py:453-476 (adds total tokens)."""
    return calls.groupBy("provider").agg(
        F.count("*").alias("total_calls"),
        F.sum(F.col("success").cast("int")).alias("api_successful"),
        F.sum(F.col("parsing_success").cast("int"))
         .alias("parsing_successful"),
        F.round(F.avg("duration_seconds"), 4).alias("avg_duration"),
        F.round(F.avg("cost_usd"), 4).alias("avg_cost_per_call"),
        F.round(F.sum("cost_usd"), 4).alias("total_cost"),
        F.round(F.avg("total_tokens"), 4).alias("avg_tokens"),
        F.sum("total_tokens").alias("total_tokens"),
        F.round(F.avg("triples_count"), 4).alias("avg_triples"),
        _rate("success").alias("api_success_rate"),
    )


def hourly_activity(calls: DataFrame) -> DataFrame:
    """Calls per hour-of-day + hourly timeline
    (llm_evaluation_app.py:620-646: df['hour'] = timestamp.dt.hour,
    groupby size)."""
    return (calls.groupBy(F.hour("timestamp").alias("hour"))
            .agg(F.count("*").alias("calls"),
                 F.round(F.sum("cost_usd"), 4).alias("cost_usd")))


def daily_cost(calls: DataFrame) -> DataFrame:
    """Daily cost trend (llm_evaluation_app.py:524:
    df.groupby('date')['cost_usd'].sum()); adds the call count the
    dashboard plots alongside."""
    return (calls.groupBy(F.to_date("timestamp").alias("date"))
            .agg(F.count("*").alias("calls"),
                 F.round(F.sum("cost_usd"), 4).alias("cost_usd")))


def efficiency_stats(calls: DataFrame) -> DataFrame:
    """Cost-efficiency by (provider, template_type)
    (llm_evaluation_app.py:604-612); cost_per_triple averages over
    the non-null rows only (pandas mean skips NaN)."""
    enriched = with_derived_ratios(calls)
    return enriched.groupBy("provider", "template_type").agg(
        F.round(F.avg("cost_per_triple"), 6).alias("avg_cost_per_triple"),
        F.round(F.avg("cost_usd"), 6).alias("avg_cost"),
        F.round(F.avg("triples_count"), 6).alias("avg_triples"),
        F.count("*").alias("n_calls"),
    )


# (provider, combined input+output $ per 1K tokens) — the dry-run
# estimator's hardcoded menu (test_llm_extraction.py:55-61)
COST_PER_1K = (("openai", 0.0035), ("claude", 0.0015))


def estimate_llm_cost(messages: DataFrame,
                      batch_sizes: tuple[int, ...] = (10, 20, 50),
                      providers=COST_PER_1K) -> DataFrame:
    """Prospective DRY-RUN cost estimator — the reference's
    estimate-before-you-spend tool (test_llm_extraction.py:18-75),
    no API calls:

    - est_tokens = total clean_text chars // 4 (the deliberately
      crude 4-chars/token figure of :37 — distinct from the runtime
      batcher's max(chars/3.5, words*1.3) heuristic in
      operators/llm_extract.py, which the reference also keeps
      separate);
    - est_requests = sum over (segment, type) groups of
      ceil(group_size / batch_size) — the segment+type batching the
      real extractor performs (:39-52);
    - est_cost_usd = est_tokens * rate/1K * 1.5 safety margin (:63).

    One row per (provider, batch_size).  Plan shape: one global agg +
    one map-side-combinable (segment, type) count, then joins against
    two literal menus — no per-row Python, one shuffle.
    """
    spark = messages.sparkSession
    stats = (messages.agg(
        F.count("*").alias("n_messages"),
        F.countDistinct("segment_id").alias("n_segments"),
        F.expr("div(sum(length(clean_text)), 4)")  # exact integer //
        .alias("est_tokens")))
    grp = (messages.groupBy("segment_id", "type")
           .agg(F.count("*").alias("n")))
    bs = spark.createDataFrame([(int(b),) for b in batch_sizes],
                               "batch_size long")
    reqs = (grp.crossJoin(F.broadcast(bs))
            .groupBy("batch_size")
            .agg(F.sum(F.expr("div(n + batch_size - 1, batch_size)"))
                 .alias("est_requests")))
    pr = spark.createDataFrame(list(providers),
                               "provider string, rate_per_1k double")
    return (reqs.crossJoin(F.broadcast(pr))
            .crossJoin(F.broadcast(stats))
            .select("provider", "batch_size", "n_messages",
                    "n_segments", "est_tokens", "est_requests",
                    F.round((F.col("est_tokens")
                             * F.col("rate_per_1k") / F.lit(1000))
                            * F.lit(1.5), 6).alias("est_cost_usd")))
