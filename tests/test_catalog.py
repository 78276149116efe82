from __future__ import annotations

from project_discord_knowledge_graph_spark.sources.catalog import (
    merge_triples, read_table, write_table,
)


def test_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    p = str(tmp_path / "t")
    write_table(df, p)
    assert read_table(spark, p).count() == 2


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, ["subject", "predicate", "object", "confidence"])


def test_merge_triples_idempotent(spark, tmp_path):
    p = str(tmp_path / "triples")
    a = _triples(spark, [("s1", "p", "o1", 0.8), ("s2", "p", "o2", 0.9)])
    merge_triples(spark, a, p)
    assert spark.read.parquet(p).count() == 2

    # overlapping batch: only genuinely new keys land.  "S2" differs
    # only by case -> same key as s2 (reference key is lowered);
    # "s2 " has an *internal* trailing subject space, which the
    # reference's whole-string strip does NOT remove -> distinct key.
    b = _triples(spark, [("s2", "p", "o2", 0.9), ("s3", "p", "o3", 0.7),
                         ("S2", "p", "o2", 0.9), ("s2 ", "p", "o2", 0.9)])
    merge_triples(spark, b, p)
    got = spark.read.parquet(p)
    assert got.count() == 4  # + s3, + "s2 |p|o2"; S2 collapsed

    # re-merging the same batch changes nothing
    merge_triples(spark, b, p)
    assert spark.read.parquet(p).count() == 4
