"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "kg-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra: dict[str, str] | None = None) -> SparkSession:
    """Build a session.

    Defaults chosen for the target workload (wide scans + a few heavy
    shuffles + Arrow-batched pandas UDFs):

    - AQE on, with skew-join splitting and partition coalescing — the
      north rule's head-entity skew is handled at runtime on the join
      side (explicit salting handles the groupBy side, see
      operators/entity.py).
    - Arrow enabled for pandas UDFs; 10k-row batches bound UDF memory.
    - Session timezone pinned to UTC: every reference timestamp is
      ISO-8601 UTC and segment ids hash the hour bucket.
    """
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cores}]"
    if shuffle_partitions is None:
        n = cores if cores.isdigit() else os.cpu_count() or 8
        shuffle_partitions = int(n)

    b = (
        SparkSession.builder.appName(app).master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Prefer shuffled-hash over sort-merge when the build side fits
        # (guide section 3.1/9): skips both sorts; the AQE threshold
        # below additionally rewrites SMJ->SHJ at runtime only when
        # every post-shuffle partition is under 64 MB, which bounds
        # the build-side memory at any scale (partition count grows
        # with the data, AQE skew-split caps stragglers).  Measured
        # at sf1.0: mention/semantic link joins -10..25%, no query
        # slower.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                "64MB")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
