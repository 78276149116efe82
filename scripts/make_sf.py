#!/usr/bin/env python
"""Upsample the driver-generated sf0.1 tables to a larger scale
factor (default 10x -> "sf1.0") for cliff-hunting perf runs.

Replication remaps every primary/foreign key per replica (offset =
replica * 10^9, consistently across fact/dim so joins stay key-local)
— a naive copy would leave identical join keys in every replica and
self-joins would blow up quadratically, measuring a data artifact
rather than the engine.  Specifics:

- region/nation: true dimensions, NOT scaled (like TPC-H itself).
- customer/supplier/part/orders/lineitem: all *key columns shifted
  consistently; attribute columns untouched, so per-key distributions
  match sf0.1 exactly and only the key cardinality grows.
- events: event_id/user_id shifted — the SEGMENT universe grows 10x
  at flat per-segment density (segment_id derives from event_id, so
  the QA link joins scale linearly, as on a genuinely bigger
  corpus).  The author universe does NOT grow: events_messages
  derives author as user_id % 7, so replica users still land in
  {u0..u6} — the offset permutes which of the 7 authors a replica
  row maps to (KEY_OFFSET % 7 != 0), but cannot mint new ones —
  author-keyed aggregates see 10x-deeper groups, not more groups.
- documents: doc_id shifted; text gets a per-replica tag so
  exact/near-dup cluster sizes stay flat instead of every document
  gaining 9 perfect duplicates.
- embeddings: vec_id shifted; the first vector component gets a tiny
  per-replica perturbation (+r * 1e-3) so identical-vector ties don't
  collapse ANN bucket structure.

This is a BENCH corpus: value-level correctness is gated at sf0.01 by
the oracle driver; here only the scaling behavior matters.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

KEY_OFFSET = 1_000_000_000

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")

_KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replicate(df: DataFrame, table: str, factor: int) -> DataFrame:
    parts = []
    for r in range(factor):
        d = df
        for k in _KEY_COLS.get(table, []):
            d = d.withColumn(k, F.col(k) + F.lit(r * KEY_OFFSET))
        if table == "documents" and r > 0:
            d = d.withColumn(
                "text", F.concat(F.lit(f"replica {r} "), F.col("text"))
            ).withColumn("n_chars", F.length("text").cast("long"))
        if table == "embeddings" and r > 0:
            d = d.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == 0, (x + F.lit(r * 1e-3)).cast("float")
                    ).otherwise(x)))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def make_sf(spark: SparkSession, src_dir: str, out_dir: str,
            factor: int = 10) -> None:
    for t in TABLES:
        df = spark.read.parquet(f"{src_dir}/{t}.parquet")
        if t in ("region", "nation"):
            out = df
        else:
            out = _replicate(df, t, factor)
        # single-file-per-table layout matches the source dirs (the
        # query registry globs '<table>.parquet' paths)
        out.coalesce(max(1, factor // 2)).write.mode(
            "overwrite").parquet(f"{out_dir}/{t}.parquet")


if __name__ == "__main__":
    import argparse

    from project_discord_knowledge_graph_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/kg_sf1.0")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark("make-sf", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    make_sf(spark, args.src, args.out, args.factor)
    print(f"wrote {args.out} at {args.factor}x {args.src}")
