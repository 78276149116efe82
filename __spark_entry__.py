"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full KG rule path (classify -> extract ->
                dedup -> validate + Q&A links) over the sf0.001
                corpus, returning the extracted triple set.
queries()     — one entry per implemented operator family
                (SURVEY.md section 2), each (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-executable ANSI SQL equivalents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from project_discord_knowledge_graph_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    triples = EQ.q_triples_dedup(spark, sf_dir)
    links = EQ.q_link_replies(spark, sf_dir).unionByName(
        EQ.q_link_mentions(spark, sf_dir))
    return triples.unionByName(links)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in EQ.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in EQ.QUERIES.items()
            if sql is not None}
