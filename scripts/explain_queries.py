#!/usr/bin/env python
"""Dump .explain("formatted") for the bench-timed queries.

Usage: python scripts/explain_queries.py <out_dir> [suffix] [names...]

Writes <out_dir>/<query>_<suffix>.txt (suffix default "before") for
each named query (default: the 23 registry queries bench.py times).
The judge reads these against OPTIMIZATION_r07.md plan claims.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "kg_triples_dedup", "kg_link_replies", "kg_link_mentions",
    "kg_link_semantic", "kg_classify_counts", "kg_classify_zero_shot",
    "tpch_q1_pricing", "tpch_q3_topk", "win_session_counts",
    "agg_hourly_events", "dedup_exact", "dedup_minhash_signatures",
    "ann_cosine_topk", "text_metrics", "graph_components",
    "cmp_extract_variants", "kg_prune_candidates", "discord_flatten",
    "discord_repair_flatten", "ann_lsh_topk", "scalar_ts_normalize",
    "llm_daily_cost", "kg_extractions_per_day",
]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r07"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from project_discord_knowledge_graph_spark import entry_queries as EQ
    from project_discord_knowledge_graph_spark.session import get_spark

    spark = get_spark("explain", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for name in names:
            fn, _sql = EQ.QUERIES[name]
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"),
                      "w") as f:
                f.write(txt)
            print(f"wrote {name}_{suffix}.txt "
                  f"({txt.count('Exchange')} Exchange refs)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
