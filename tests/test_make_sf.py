"""scripts/make_sf.py: the 10x upsampler must remap keys per replica
(no duplicated join keys) while leaving dimensions alone."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))


def test_make_sf_replicates_with_disjoint_keys(spark, tmp_path):
    from make_sf import KEY_OFFSET, make_sf

    src = "/root/testdata/sf0.001"
    out = str(tmp_path / "sf2x")
    make_sf(spark, src, out, factor=2)

    for t, key in (("orders", "o_orderkey"), ("events", "event_id"),
                   ("documents", "doc_id"), ("embeddings", "vec_id")):
        a = spark.read.parquet(f"{src}/{t}.parquet")
        b = spark.read.parquet(f"{out}/{t}.parquet")
        assert b.count() == 2 * a.count(), t
        # keys disjoint across replicas: total distinct = 2x source
        assert b.select(key).distinct().count() == \
            2 * a.select(key).distinct().count(), t
    # dimensions NOT scaled
    for t in ("region", "nation"):
        a = spark.read.parquet(f"{src}/{t}.parquet")
        b = spark.read.parquet(f"{out}/{t}.parquet")
        assert b.count() == a.count(), t

    # foreign keys remapped consistently: every replica-1 lineitem
    # joins a replica-1 order (no dangling keys)
    li = spark.read.parquet(f"{out}/lineitem.parquet") \
        .where(F.col("l_orderkey") >= KEY_OFFSET)
    od = spark.read.parquet(f"{out}/orders.parquet") \
        .where(F.col("o_orderkey") >= KEY_OFFSET)
    dangling = li.join(od, li.l_orderkey == od.o_orderkey,
                       "left_anti").count()
    assert dangling == 0

    # documents: replica text tagged, so exact-dedup cluster sizes
    # stay flat instead of every doc gaining a perfect duplicate
    docs = spark.read.parquet(f"{out}/documents.parquet")
    rep1 = docs.where(F.col("doc_id") >= KEY_OFFSET)
    assert rep1.where(~F.col("text").startswith("replica 1 ")) \
        .count() == 0
