"""End-to-end KG-construction plan: pages -> triples (-> graph).

Query lifecycle, mirroring the reference's Step3 path (SURVEY.md
section 3.1) as one lazy DAG:

    scan pages (column-pruned, watermark-pruned)
      -> extract text from html        [Arrow pandas UDF]
      -> parse message fields           [native regexp]
      -> clean_text P3                  [Arrow pandas UDF]
      -> classify C1                    [native, codegen]
      -> E1-E8 triple extraction        [native, one pass, no shuffle]
      -> J1/J2 Q&A link joins           [2 hash joins on segment keys]
      -> A8 dedup + P7 validation       [1 shuffle on dedup key]
      -> triples

Shuffle budget: exactly three exchanges (two link joins + dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import aggregate_triples
from ..operators.extract import extract_triples
from ..operators.link import link_qa
from ..sources.pages import pages_to_messages, read_pages


def classify_pages(pages: DataFrame) -> DataFrame:
    """pages -> classified messages (narrow stages only).

    C1 classification is fused into the parse UDF's Python pass
    (pages_to_messages(classify=True)): the merged-alternation
    classifier runs at ~11 us/row against ~26 us/row-core for the
    JVM regex cascade over this corpus — measured ~0.9 s off the
    2M-page classify stage.  Output is byte-identical to
    with_type(pages_to_messages(pages)) (pinned in test_parity)."""
    return pages_to_messages(pages, classify=True)


def build_triples(pages: DataFrame, include_semantic: bool = False,
                  embed_udf=None, cache_messages: bool = False,
                  stage_dir: str | None = None,
                  spark: SparkSession | None = None) -> DataFrame:
    """Full rule path: pages -> validated triple set.

    Branch-feeding strategy for the classified messages (consumed by
    the extraction branch and the two link branches):

    - `stage_dir` set (production shape): materialize the classified
      table to parquet once and feed all branches from that scan —
      the html decode + text-extraction UDF runs exactly once, and
      the link branches read only their pruned join columns.  At
      petabyte scale this is the Iceberg handoff between pipeline
      stages.
    - `cache_messages`: .persist() instead (measured slower than
      recompute at small scale — columnar cache build cost).
    - neither: recompute the narrow stage per branch (fine when the
      corpus is small or the job is one-shot).
    """
    messages = classify_pages(pages)
    if stage_dir is not None:
        assert spark is not None, "stage_dir requires the SparkSession"
        # project to the columns the downstream stages read (guide:
        # project before materializing) — url/lang/thread/channel are
        # consumed by no extract/link branch, and dropping them cuts
        # the staged bytes ~20% (80 -> 64 MB at 2M pages; write wall
        # flat on tmpfs, the byte cut is the at-scale win).  The
        # triple output is provably unchanged: no downstream column
        # reference reaches the dropped four.
        messages.drop("url", "lang", "thread", "channel") \
            .write.mode("overwrite").parquet(stage_dir)
        messages = spark.read.parquet(stage_dir)
    elif cache_messages:
        messages = messages.persist()
    extracted = extract_triples(messages)
    links = link_qa(messages, include_semantic, embed_udf)
    return aggregate_triples(extracted, links)


def build_triples_from_path(spark: SparkSession, path: str,
                            after_ts: str | None = None,
                            **kw) -> DataFrame:
    if "stage_dir" in kw:
        kw.setdefault("spark", spark)
    return build_triples(read_pages(spark, path, after_ts), **kw)


_EXPORT_MSG_CACHE: list = []


def build_triples_from_export(spark: SparkSession, path: str,
                              include_semantic: bool = False,
                              embed_udf=None,
                              repair: bool = False,
                              cache_messages: bool = True) -> DataFrame:
    """The reference's actual front door: Discord channel-export JSON
    -> flatten (S1/P1/P2) -> classify (C1) -> extract (E1-E8) -> Q&A
    link (J1/J2) -> dedup + validate (A8/P7).  Same downstream DAG as
    the pages path; only the source stage differs.

    `repair=True` routes through the malformed-export repair door
    (bare-string roles/mentions etc., preprocessor.py:54-65) — one
    extra Python pass; leave off for well-formed exports.

    The classified messages feed three branches (extract + both link
    sides); without a cache each branch re-parses the export JSON and
    re-runs the clean-text UDF (measured 3x the source stage at 50k
    messages).  `cache_messages` persists the stage once per
    invocation; the previous invocation's cache is unpersisted on the
    next call (same at-most-one-entry pattern as the comparison
    query's base cache), so nothing accumulates.  Callers staging to
    parquet between pipeline phases should pass False and use
    build_triples(stage_dir=...) semantics instead."""
    from ..operators.classify import with_type
    from ..sources.discord_export import (
        export_to_messages, read_discord_export,
        read_discord_export_repaired,
    )
    reader = (read_discord_export_repaired if repair
              else read_discord_export)
    messages = with_type(export_to_messages(reader(spark, path)))
    if cache_messages:
        while _EXPORT_MSG_CACHE:
            try:  # prior entry may belong to a stopped SparkSession
                _EXPORT_MSG_CACHE.pop().unpersist()
            except Exception:
                pass
        messages = messages.persist()
        _EXPORT_MSG_CACHE.append(messages)
    extracted = extract_triples(messages)
    links = link_qa(messages, include_semantic, embed_udf)
    return aggregate_triples(extracted, links)
