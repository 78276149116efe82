"""Graph materialization: triples + canonical map -> nodes/edges.

The reference stops at a triple JSONL file (Neo4j insertion is
documented but unimplemented, extraction/README.md:96-98); the north
star requires "a materialized nodes/edges Iceberg graph".  Locally
parquet stands in for Iceberg; the write path partitions edges by
predicate (low cardinality, the dominant query filter per the
reference dashboards) so predicate-filtered reads prune files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_nodes(canonical_map: DataFrame) -> DataFrame:
    """(mention, n_occurrences, canonical_id) -> node table:
    one row per canonical entity with its member mentions."""
    return (canonical_map.groupBy("canonical_id")
            .agg(F.array_sort(F.collect_set("mention")).alias("mentions"),
                 F.sum("n_occurrences").alias("n_mentions"),
                 F.count("*").alias("n_variants")))


def build_edges(triples: DataFrame, canonical_map: DataFrame) -> DataFrame:
    """Rekey triples to canonical entity ids.

    Two joins against the mention->canonical map.  The map is tiny
    relative to the triple table (distinct entities << triples), so
    both joins are broadcast — zero shuffle of the big side.  If the
    entity universe outgrows the broadcast threshold at extreme
    scale, drop the hint and AQE picks a shuffled hash join.
    """
    cmap = F.broadcast(
        canonical_map.select(F.lower(F.trim(F.col("mention")))
                             .alias("_mention_key"),
                             "canonical_id").distinct())
    subj = cmap.withColumnRenamed("canonical_id", "subject_id")
    obj = cmap.withColumnRenamed("canonical_id", "object_id")
    return (
        triples
        .withColumn("_skey", F.lower(F.trim(F.col("subject"))))
        .withColumn("_okey", F.lower(F.trim(F.col("object"))))
        .join(subj, F.col("_skey") == subj._mention_key, "left")
        .drop("_mention_key")
        .join(obj, F.col("_okey") == obj._mention_key, "left")
        .select(
            F.coalesce("subject_id", "subject").alias("src"),
            "predicate",
            F.coalesce("object_id", "object").alias("dst"),
            "subject", "object", "message_id", "segment_id",
            "timestamp", "confidence")
    )


def write_graph(nodes: DataFrame, edges: DataFrame, base_path: str) -> None:
    """Materialize the graph (parquet standing in for Iceberg).

    The two writes are independent jobs; submitting them from two
    driver threads lets the small nodes write back-fill executors
    freed by the edge write's tail instead of running serially after
    it (guide 2.6 — actions are only sequential because driver code
    calls them sequentially).  Job descriptions are thread-local, so
    each job stays correctly labelled in the UI."""
    from concurrent.futures import ThreadPoolExecutor

    def _nodes():
        nodes.write.mode("overwrite").parquet(f"{base_path}/nodes")

    def _edges():
        (edges.write.mode("overwrite")
         .partitionBy("predicate").parquet(f"{base_path}/edges"))

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_edges), pool.submit(_nodes)]
        for f in futs:
            f.result()
