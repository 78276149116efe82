"""C1 rule classifier as a native Catalyst column expression.

Reproduces the ordered precedence of the reference's deterministic
classifier (llm_powered/nodes.py:149-268): performance > alert >
question > strategy > analysis > answer-heuristic > discussion.

All patterns are ASCII word alternations whose Python-`re` and
Java-regex semantics coincide (validated against the oracle port in
tests/test_parity.py), so the whole classifier stays inside
whole-stage codegen — no Python in this hot path at all.

A C2 zero-shot-model variant (classifier.py:32-173 in the reference,
facebook/bart-large-mnli) is pluggable behind the same column
contract; the model is not in this container, so `classify_zero_shot`
raises unless an inference fn is injected (see operators/multimodal.py
for the stubbing convention).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .. import config as C


def _any_rlike(col: Column, patterns) -> Column:
    """OR of per-pattern matches as ONE alternation regex: a single
    engine pass per row instead of one per pattern (search(p1|p2) ==
    search(p1) or search(p2) — exact same match set).  No (?i): the
    input column is pre-lowered by classify_expr and every pattern is
    lowercase ASCII (config.py), so case folding is a pure cost."""
    return col.rlike("|".join(f"(?:{p})" for p in patterns))


def classify_expr(clean_text: Column) -> Column:
    """Message type per C1 precedence (nodes.py:200-226)."""
    text = F.lower(clean_text)
    is_perf = text.rlike(C.PERFORMANCE_PATTERN) & text.rlike(
        C.RETURN_KEYWORDS)
    return (
        F.when(is_perf, F.lit("performance"))
        .when(_any_rlike(text, C.CLASSIFIER_ALERT_PATTERNS), F.lit("alert"))
        .when(_any_rlike(text, C.CLASSIFIER_QUESTION_PATTERNS),
              F.lit("question"))
        .when(_any_rlike(text, C.CLASSIFIER_STRATEGY_PATTERNS),
              F.lit("strategy"))
        .when(_any_rlike(text, C.CLASSIFIER_ANALYSIS_PATTERNS),
              F.lit("analysis"))
        .when((F.length(text) > 50) & ~text.endswith("?"), F.lit("answer"))
        .otherwise(F.lit("discussion"))
    )


def with_type(df, clean_col: str = "clean_text", out_col: str = "type"):
    """Stage: messages -> messages + type column."""
    return df.withColumn(out_col, classify_expr(F.col(clean_col)))


def classifier_segment_id_expr(channel: Column, author: Column,
                               thread: Column) -> Column:
    """The classify-only entry point's OWN segment-id scheme
    (classifier.py:112-121) — deliberately different from the
    preprocessor's md5 hour-bucket scheme and kept separate (SURVEY
    section 7 hard point): thread slug with a narrower character
    class ([^a-zA-Z0-9-]), else plain 'channel-{channel}-{author}'.
    """
    return F.when(
        thread.isNotNull(),
        F.concat(F.lit("thread-"),
                 F.regexp_replace(thread, "[^a-zA-Z0-9-]", "-"))
    ).otherwise(F.concat(F.lit("channel-"), channel, F.lit("-"), author))


def classify_udf_variant():
    """C1 as an Arrow-batched pandas UDF running Python `re` —
    the byte-parity fallback for any future pattern whose Java-regex
    behavior diverges (none of the current patterns do: the fuzz
    suite proves dialect agreement, tests/test_fuzz_parity.py).
    Returns a pandas UDF usable in place of classify_expr.
    """
    import pandas  # noqa: F401
    from pyspark.sql.types import StringType

    def _classify(texts):
        from ..oracle.reference_port import classify as _c
        return texts.fillna("").map(_c)

    _classify.__annotations__ = {"texts": pandas.Series,
                                 "return": pandas.Series}
    return F.pandas_udf(_classify, StringType()).asNondeterministic()


def classify_zero_shot(df, clean_col: str = "clean_text",
                       infer_fn=None, batch_size: int = 16):
    """C2 model classifier plumbing (reference classifier.py:137-173).

    `infer_fn(texts: pd.Series) -> pd.DataFrame[label, score]` is the
    injected model; in production it wraps a bart-large-mnli pipeline
    loaded once per executor inside an iterator pandas UDF.  The
    container has no torch/transformers, so calling without infer_fn
    raises NotImplementedError (Spark-side plumbing is still tested
    with a deterministic fake in tests/test_classify.py).
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType)

    if infer_fn is None:
        raise NotImplementedError(
            "zero-shot model not available in this environment; "
            "inject infer_fn (texts -> DataFrame[label, score])")

    schema = StructType([
        StructField("label", StringType()),
        StructField("score", DoubleType()),
    ])

    @F.pandas_udf(schema)
    def _predict(texts):
        out = infer_fn(texts.fillna(""))
        # empty text -> ('alert', 0.5) default (classifier.py:126)
        empty = texts.fillna("").str.strip() == ""
        out.loc[empty, "label"] = "alert"
        out.loc[empty, "score"] = 0.5
        return out

    pred = _predict(F.col(clean_col))
    return (df.withColumn("_pred", pred)
              .withColumn("type", F.col("_pred.label"))
              .withColumn("confidence", F.col("_pred.score"))
              .drop("_pred"))
