"""LLM-powered extraction path (pluggable, non-parity).

The reference's second extraction engine calls an LLM API per message
batch with token-aware batch sizing (llm_powered/extractor_llm.py,
token_utils.py:125-221) and records per-call cost metrics
(llm_call_recorder.py).  It is inherently nondeterministic, so it is
excluded from the parity path — but the Spark-side machinery is real:

- `estimate_tokens` reproduces the reference heuristic
  (token_utils.py:37-78: max(chars/3.5, words*1.3) + 10% overhead).
- `split_by_token_limit` re-expresses the greedy token-aware batch
  splitter (token_utils.py:185-221) as a pure function applied inside
  each segment group.
- `extract_with_llm` runs provider calls via applyInPandas, one
  Python invocation per segment group (the reference's context unit,
  extractor_llm.py:587-606), batching within the group.  The provider
  is injected: `provider(batch: list[dict]) -> list[tuple]` returning
  (subject, predicate, object, confidence) tuples — in production an
  API client created once per executor; here a deterministic fake in
  tests, or NotImplementedError without one.
- Confidence validation: clamp to [0,1] else 0.5, matching
  nodes.py:677-679.

Cost accounting note: per-batch token estimates are emitted as
columns so the caller can aggregate spend into the lineage table
(replacing the SQLite llm_calls store, S4).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

SAFE_TOKENS_PER_REQUEST = 13_000  # claude tier-1 derived default


def estimate_tokens(text: str) -> int:
    """token_utils.py:37-78 heuristic, reproduced exactly."""
    if not text:
        return 0
    char_based = len(text) / 3.5
    word_based = len(text.split()) * 1.3
    est = max(char_based, word_based)
    return int(est + est * 0.1)


def split_by_token_limit(texts: list[str],
                         target_tokens: int = SAFE_TOKENS_PER_REQUEST
                         ) -> list[list[int]]:
    """Greedy token-aware batching: returns index batches whose
    estimated token sums stay under target (always >= 1 per batch)."""
    batches: list[list[int]] = []
    cur: list[int] = []
    cur_tokens = 0
    for i, t in enumerate(texts):
        tk = estimate_tokens(t) + 10  # per-message format overhead
        if cur and cur_tokens + tk > target_tokens:
            batches.append(cur)
            cur, cur_tokens = [], 0
        cur.append(i)
        cur_tokens += tk
    if cur:
        batches.append(cur)
    return batches


LLM_TRIPLE_SCHEMA = StructType([
    StructField("subject", StringType()),
    StructField("predicate", StringType()),
    StructField("object", StringType()),
    StructField("message_id", StringType()),
    StructField("segment_id", StringType()),
    StructField("timestamp", StringType()),
    StructField("confidence", DoubleType()),
    StructField("extraction_method", StringType()),
    StructField("batch_tokens", LongType()),
])


def extract_with_llm(messages: DataFrame,
                     provider: Callable[[list[dict]], list[tuple]] | None
                     = None,
                     target_tokens: int = SAFE_TOKENS_PER_REQUEST
                     ) -> DataFrame:
    """Segment-grouped, token-batched LLM triple extraction.

    Each segment group is one applyInPandas call (the reference's
    LLM context unit); within it, messages split into token-aware
    batches and the provider is invoked once per batch.  Output rows
    carry extraction_method='llm' plus the batch token estimate for
    cost rollups.
    """
    if provider is None:
        raise NotImplementedError(
            "no LLM provider in this environment; inject "
            "provider(batch: list[dict]) -> list[(s,p,o,conf)]")

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("timestamp")  # extractor_llm.py:606
        rows = pdf.to_dict("records")
        out = []
        for idx_batch in split_by_token_limit(
                [r.get("clean_text") or "" for r in rows], target_tokens):
            batch = [rows[i] for i in idx_batch]
            tokens = sum(estimate_tokens(r.get("clean_text") or "") + 10
                         for r in batch)
            for s, p, o, conf in provider(batch):
                conf = float(conf)
                if not 0.0 <= conf <= 1.0:   # nodes.py:677-679
                    conf = 0.5
                out.append((str(s), str(p), str(o),
                            batch[0]["message_id"],
                            batch[0]["segment_id"],
                            batch[-1]["timestamp"],
                            conf, "llm", tokens))
        return pd.DataFrame(out, columns=[f.name for f in
                                          LLM_TRIPLE_SCHEMA.fields])

    cols = ["message_id", "segment_id", "timestamp", "author",
            "clean_text"]
    return (messages.select(*cols)
            .groupBy("segment_id")
            .applyInPandas(run_group, LLM_TRIPLE_SCHEMA))


def attribute_triples(outputs: DataFrame, messages: DataFrame,
                      batch_col: str = "segment_id") -> DataFrame:
    """J6: LLM-output -> source-message attribution
    (extractor_llm.py:330-345 and the three sibling loops).

    The reference scans the batch for the FIRST message whose author
    equals the triple's subject and stamps its message_id /
    timestamp onto the triple (batches are timestamp-sorted, so
    'first' = earliest; message_id added as the explicit tie-break
    the Python loop gets implicitly from list order).  Outputs whose
    subject matches no batch author are dropped, exactly as the
    reference appends nothing.

    Spark shape: one window to pick each (batch, author)'s first
    message, then an equi hash join on (batch, author) — the O(n*m)
    per-batch scan becomes a single shuffle pair.

    Any message_id/timestamp columns already on `outputs` (e.g. the
    batch-level stamps extract_with_llm emits) are REPLACED by the
    matched message's values, exactly as the reference overwrites the
    Triple fields — and so the join never produces ambiguous duplicate
    column names."""
    from pyspark.sql import Window, functions as F

    # nulls LAST: a quarantined message (null normalized timestamp)
    # must never win rank 1 and stamp a null timestamp onto the
    # triple — the reference never carries null timestamps.
    w = Window.partitionBy(batch_col, "author") \
              .orderBy(F.col("timestamp").asc_nulls_last(), "message_id")
    first = (messages
             .withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1)
             .select(F.col(batch_col), F.col("author").alias("subject"),
                     "message_id", "timestamp"))
    outputs = outputs.drop("message_id", "timestamp")
    return outputs.join(first, [batch_col, "subject"], "inner")


def cost_summary(llm_triples: DataFrame) -> DataFrame:
    """Per-segment cost rollup (the dashboards' A6/A11 shape over the
    lineage metrics, llm_evaluation_app.py:205-380)."""
    from pyspark.sql import functions as F
    return (llm_triples
            .groupBy("segment_id")
            .agg(F.count("*").alias("n_triples"),
                 F.sum("batch_tokens").alias("est_tokens"),
                 F.round(F.avg("confidence"), 4).alias("avg_conf")))
