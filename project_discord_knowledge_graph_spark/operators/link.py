"""J1-J3: Q&A linking as DataFrame joins.

The reference loops answers x questions per segment
(rule_based/extractor.py:398-543); here:

- J1 reply links: equi self-join on (segment_id, reply_to=message_id).
- J2 mention links: explode(mentions) + equi-join on (segment_id,
  lower(author)) with the 10-minute window as a residual range
  predicate — Spark hashes the equi part, evaluates the range as a
  post-join filter.  NOTE the reference checks only
  (a_ts - q_ts) <= window with no lower bound (extractor.py:480), so
  answers *preceding* a question also link; reproduced faithfully.
- J3 semantic links: segment-bounded similarity join behind a
  pluggable embedder (sentence-transformers is absent in the
  reference's fallback path AND this container, so J1+J2 is the
  parity path; J3 ships with a deterministic hash embedder for tests
  and an LSH-blocked plan for scale).

Skew note: segment_id is the join key; hour-bucketed segments bound
segment size, and AQE skew-join splitting is enabled in session.py
for the head segments the north rule worries about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import config as C


def _links(qa: DataFrame, method: str, conf, priority: int) -> DataFrame:
    conf_col = conf if not isinstance(conf, float) else F.lit(conf)
    return qa.select(
        F.col("q_id").alias("subject"),
        F.lit("answered_by").alias("predicate"),
        F.col("a_id").alias("object"),
        F.concat("q_id", F.lit(f"_{method}_"), "a_id").alias("message_id"),
        F.col("q_segment").alias("segment_id"),
        F.col("a_ts").alias("timestamp"),
        conf_col.alias("confidence"),
        F.lit(priority).alias("stage_priority"),
    )


def split_qa(messages: DataFrame,
             include_text: bool = False) -> tuple[DataFrame, DataFrame]:
    """Project questions/answers to the minimal link columns.

    clean_text is excluded unless the semantic linker needs it —
    keeping it out lets Catalyst prune the (expensive) text columns
    entirely out of the J1/J2 join scans.
    """
    q_cols = [
        F.col("message_id").alias("q_id"),
        F.lower(F.col("author")).alias("q_author"),
        F.col("segment_id").alias("q_segment"),
        F.col("timestamp").alias("q_ts"),
        F.col("warc_ts").alias("q_tstamp"),
    ]
    a_cols = [
        F.col("message_id").alias("a_id"),
        F.col("segment_id").alias("a_segment"),
        F.col("timestamp").alias("a_ts"),
        F.col("warc_ts").alias("a_tstamp"),
        F.col("reply_to"),
        F.col("mentions"),
    ]
    if include_text:
        q_cols.append(F.col("clean_text").alias("q_text"))
        a_cols.append(F.col("clean_text").alias("a_text"))
    questions = messages.where(F.col("type") == "question").select(*q_cols)
    answers = messages.where(F.col("type") == "answer").select(*a_cols)
    return questions, answers


def link_by_replies(questions: DataFrame, answers: DataFrame) -> DataFrame:
    """J1 (extractor.py:441-463), confidence 0.95."""
    joined = answers.where(F.col("reply_to").isNotNull()).join(
        questions,
        (F.col("reply_to") == F.col("q_id"))
        & (F.col("a_segment") == F.col("q_segment")),
        "inner")
    return _links(joined, "reply", C.CONF_LINK_REPLY,
                  C.STAGE_PRIORITY_LINK_REPLY)


def link_by_mentions(questions: DataFrame, answers: DataFrame,
                     time_window_minutes: int = C.QA_TIME_WINDOW_MINUTES
                     ) -> DataFrame:
    """J2 (extractor.py:465-492), confidence 0.80.

    One link per (mention element, question) pair within the window;
    duplicate links collapse in the dedup stage exactly as the
    reference's keep-first dedup collapses them.
    """
    exploded = answers.where(F.size("mentions") > 0).select(
        "a_id", "a_segment", "a_ts", "a_tstamp",
        F.explode("mentions").alias("mention"))
    cond = (
        (F.lower(F.col("mention")) == F.col("q_author"))
        & (F.col("a_segment") == F.col("q_segment"))
        & (F.unix_micros(F.col("a_tstamp").cast("timestamp_ltz"))
           - F.unix_micros(F.col("q_tstamp").cast("timestamp_ltz"))
           <= time_window_minutes * 60 * 1_000_000)
    )
    joined = exploded.join(questions, cond, "inner")
    return _links(joined, "mention", C.CONF_LINK_MENTION,
                  C.STAGE_PRIORITY_LINK_MENTION)


def link_by_similarity(questions: DataFrame, answers: DataFrame,
                       embed_udf=None,
                       time_window_minutes: int = C.QA_TIME_WINDOW_MINUTES,
                       threshold: float = C.QA_SIMILARITY_THRESHOLD
                       ) -> DataFrame:
    """J3 (extractor.py:494-543): segment-bounded cosine join.

    `embed_udf` is a pandas UDF text -> array<float> (in production a
    sentence-transformer loaded per executor; tests inject a
    deterministic hash embedder).  Alternatively the inputs may carry
    PRECOMPUTED `q_vec` / `a_vec` array columns (embed_udf=None) — the
    production shape at corpus scale: embed each message once, store
    the vectors, and join them in, instead of re-embedding inside
    every link join.  The join is equi on segment_id with
    time + cosine residual predicates — the segment bound is the
    blocking that keeps this from being a cross join at scale; for
    unbounded corpora use operators/ann.py LSH blocking instead.

    The cosine is computed in double and rounded to 6 places *before*
    the threshold test (same policy as operators/ann.py) so the kept
    set is stable across engines/architectures.
    """
    if embed_udf is not None:
        q = questions.withColumn("q_vec", embed_udf(F.col("q_text")))
        a = answers.withColumn("a_vec", embed_udf(F.col("a_text")))
    elif "q_vec" in questions.columns and "a_vec" in answers.columns:
        q = questions.withColumn("q_vec",
                                 F.col("q_vec").cast("array<double>"))
        a = answers.withColumn("a_vec",
                               F.col("a_vec").cast("array<double>"))
    else:
        raise NotImplementedError(
            "no embedder in this container; inject embed_udf "
            "(text -> array<float>) or provide precomputed q_vec/a_vec "
            "columns")

    q, a = _with_vec_norms(q, a)
    joined = _semantic_window_sim(
        a.join(q, (F.col("a_segment") == F.col("q_segment")), "inner"),
        time_window_minutes, threshold)
    return _links(joined, "semantic", F.col("sim"),
                  C.STAGE_PRIORITY_LINK_SEMANTIC)


def _with_vec_norms(q: DataFrame, a: DataFrame
                    ) -> tuple[DataFrame, DataFrame]:
    """Attach per-side vector norms BEFORE the pair join: the join
    evaluates O(pairs) similarities but only O(rows) distinct norms
    exist — hoisting them removes two of the three per-pair array
    aggregates (guide 2.3).  Values are bit-identical to computing
    the norm inside cosine_expr."""
    from .ann import _norm
    return (q.withColumn("_qn", _norm(F.col("q_vec"))),
            a.withColumn("_an", _norm(F.col("a_vec"))))


def _semantic_window_sim(joined: DataFrame, time_window_minutes: int,
                         threshold: float) -> DataFrame:
    """The ONE J3 admission predicate — shared by the exact and the
    LSH-blocked semantic linkers so the two paths can never drift
    (the LSH path's prunes-never-invents guarantee and its recall
    gate both assume identical predicates): exact integer-micros
    window (NTZ-safe, same arithmetic as the J2 mention join), then
    cosine (the ONE arithmetic from operators/ann.py — duplicated
    float-determinism arithmetic desynchronizes engines over time)
    rounded to 6 places BEFORE the threshold test.

    When the caller attached per-side norms (`_qn`/`_an`, see
    _with_vec_norms) the pair loop reuses them (ann._pair_sim,
    bit-identical to cosine_expr); otherwise the full cosine_expr
    runs per pair."""
    from .ann import _pair_sim, cosine_expr

    delta = (F.unix_micros(F.col("a_tstamp").cast("timestamp_ltz"))
             - F.unix_micros(F.col("q_tstamp").cast("timestamp_ltz")))
    if "_qn" in joined.columns and "_an" in joined.columns:
        sim = _pair_sim("q_vec", "a_vec", "_qn", "_an")
    else:
        sim = cosine_expr(F.col("q_vec"), F.col("a_vec"))
    return (joined
            .where((delta <= time_window_minutes * 60 * 1_000_000)
                   & (delta >= 0))
            .withColumn("sim", F.round(sim, 6))
            .where(F.col("sim") > threshold))


def link_by_similarity_lsh(questions: DataFrame, answers: DataFrame,
                           n_planes: int = 4, dim: int = 64,
                           probe_hamming: int = 1,
                           time_window_minutes: int =
                           C.QA_TIME_WINDOW_MINUTES,
                           threshold: float = C.QA_SIMILARITY_THRESHOLD
                           ) -> DataFrame:
    """J3's scale path: the segment-bounded cosine join of
    `link_by_similarity` is quadratic in segment size — fine for
    hour-bucketed segments, not for a corpus whose segments are
    unbounded (one giant channel, no thread structure).  This variant
    additionally blocks on the hyperplane-LSH signature of the
    embedding (operators/ann.py machinery reused verbatim: same
    deterministic planes, same Hamming-1 probe expansion on the
    question side), so candidates are (segment, bucket)-bounded.

    APPROXIMATE by construction: a true pair whose vectors land in
    buckets more than `probe_hamming` apart is missed — recall is
    gated >= 0.9 against the exact join in tests, tuning like
    ann.lsh_topk (fewer planes = bigger buckets = higher recall).
    Requires precomputed q_vec/a_vec (the production shape; an
    embed-inside-the-join UDF would re-embed per candidate).
    Every kept pair passes the SAME exact time-window + rounded-
    cosine-threshold predicates as the exact operator — blocking
    only prunes candidates, never admits false positives."""
    from .ann import probe_buckets_expr, with_lsh_bucket

    if "q_vec" not in questions.columns \
            or "a_vec" not in answers.columns:
        raise ValueError(
            "link_by_similarity_lsh requires precomputed q_vec/a_vec "
            "columns (embed once, store, join)")
    q = with_lsh_bucket(
        questions.withColumn("q_vec", F.col("q_vec").cast(
            "array<double>")),
        n_planes, dim, vec_col="q_vec", out_col="_qb")
    q = (q.withColumn("_bucket",
                      F.explode(probe_buckets_expr(
                          "_qb", n_planes, probe_hamming)))
         .drop("_qb"))
    a = with_lsh_bucket(
        answers.withColumn("a_vec", F.col("a_vec").cast(
            "array<double>")),
        n_planes, dim, vec_col="a_vec", out_col="_bucket")

    q, a = _with_vec_norms(q, a)
    # an answer lives in exactly ONE bucket while question probes
    # explode, so (q, a) pairs are produced at most once — no dedup
    joined = _semantic_window_sim(
        a.join(q, ["_bucket"], "inner")
        .where(F.col("a_segment") == F.col("q_segment")),
        time_window_minutes, threshold)
    return _links(joined, "semantic", F.col("sim"),
                  C.STAGE_PRIORITY_LINK_SEMANTIC)


def prune_answer_candidates(questions: DataFrame, answers: DataFrame,
                            max_answers: int = 20) -> DataFrame:
    """J4 answer-candidate pruning (llm_powered/nodes.py:431-496),
    per segment (the reference's LLM context unit):

    1. keep every answer that directly replies to one of the
       segment's questions (reply_to semi-join);
    2. plus the first `max_answers` answers strictly after the
       segment's latest question timestamp, chronologically;
    3. dedupe by message id with replies taking precedence, then cap
       at `max_answers` in (replies-first, timestamp, id) order —
       reproducing the reference's list order under its own
       "answers sorted by timestamp" assumption, with the id as the
       explicit tie-break the Python list implicitly lacks.

    Input frames are the split_qa projections.  Output:
    (segment_id, message_id, is_reply, rank) with rank 1-based.
    Both halves are single equi-joins on segment-bounded keys plus
    one window — no cross product, scales with segment count.
    """
    q = questions.select("q_id", "q_segment", "q_tstamp")
    a = answers.select("a_id", "a_segment", "a_tstamp", "reply_to")

    rep = (a.join(q.select(F.col("q_id").alias("reply_to"),
                           F.col("q_segment").alias("a_segment")),
                  ["reply_to", "a_segment"], "left_semi")
           .select("a_id", "a_segment", "a_tstamp",
                   F.lit(0).alias("prio")))

    latest_q = q.groupBy(F.col("q_segment").alias("a_segment")) \
                .agg(F.max("q_tstamp").alias("latest_q_ts"))
    w_chr = Window.partitionBy("a_segment").orderBy("a_tstamp", "a_id")
    chro = (a.join(latest_q, "a_segment")
            .where(F.col("a_tstamp") > F.col("latest_q_ts"))
            .withColumn("_rn", F.row_number().over(w_chr))
            .where(F.col("_rn") <= max_answers)
            .select("a_id", "a_segment", "a_tstamp",
                    F.lit(1).alias("prio")))
    chro = chro.join(rep.select("a_id", "a_segment"),
                     ["a_id", "a_segment"], "left_anti")

    w = Window.partitionBy("a_segment").orderBy("prio", "a_tstamp", "a_id")
    return (rep.unionByName(chro)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= max_answers)
            .select(F.col("a_segment").alias("segment_id"),
                    F.col("a_id").alias("message_id"),
                    (F.col("prio") == 0).alias("is_reply"),
                    F.col("rank")))


def link_qa(messages: DataFrame, include_semantic: bool = False,
            embed_udf=None) -> DataFrame:
    """E10 composite: reply + mention (+ optional semantic) links."""
    questions, answers = split_qa(messages, include_text=include_semantic)
    out = link_by_replies(questions, answers).unionByName(
        link_by_mentions(questions, answers))
    if include_semantic:
        out = out.unionByName(
            link_by_similarity(questions, answers, embed_udf))
    return out
