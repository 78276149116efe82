"""WARC front door: round-trip and pipeline-equivalence contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_discord_knowledge_graph_spark.sources.synth import pages_df
from project_discord_knowledge_graph_spark.sources.warc import (
    read_warc, write_warc,
)


def test_warc_round_trip_exact(spark, tmp_path):
    """pages -> WARC -> pages: url, warc_ts, and html BYTES survive
    exactly (the byte-identical-text-per-url contract starts at the
    source)."""
    pages = pages_df(spark, 200, seed=21).persist()
    out = str(tmp_path / "warc")
    write_warc(pages, out)
    back = read_warc(spark, out)

    a = {(r.url, r.warc_ts, bytes(r.html)) for r in pages.collect()}
    b = {(r.url, r.warc_ts, bytes(r.html)) for r in back.collect()}
    assert b == a
    assert back.schema["warc_ts"].dataType.typeName().startswith(
        "timestamp")
    # non-response records are dropped, not mis-parsed
    with open(f"{out}/warcinfo.warc", "w", newline="") as f:
        f.write("WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                "WARC-Date: 2024-01-01T00:00:00Z\r\n\r\n"
                "software: test\r\n\r\n")
    again = read_warc(spark, out)
    assert again.count() == 200
    pages.unpersist()


def test_warc_pages_feed_the_pipeline(spark, tmp_path):
    """WARC-read pages produce the IDENTICAL message set as the
    parquet pages table (clean_text byte-for-byte) — the WARC door
    is a source swap, not a semantics change."""
    from project_discord_knowledge_graph_spark.sources.pages import (
        pages_to_messages,
    )

    pages = pages_df(spark, 150, seed=22)
    out = str(tmp_path / "warc")
    write_warc(pages, out)

    want = {(r.message_id, r.clean_text, r.segment_id)
            for r in pages_to_messages(pages).collect()}
    got = {(r.message_id, r.clean_text, r.segment_id)
           for r in pages_to_messages(read_warc(spark, out)).collect()}
    assert got == want and want


def test_wet_round_trip_feeds_dedup(spark, tmp_path):
    """WET (conversion) records round-trip and feed the corpus-
    curation family: near-dup docs written as WET, read back, and
    deduped by the banded near_dedup."""
    from project_discord_knowledge_graph_spark.operators.dataset import (
        near_dedup,
    )
    from project_discord_knowledge_graph_spark.sources.warc import (
        read_wet, write_wet,
    )

    rows = [
        ("u://a", "2024-01-01 00:00:00",
         "the quick brown fox jumps over the lazy dog tonight"),
        ("u://b", "2024-01-01 00:01:00",
         "the quick brown fox jumps over the lazy dog tonight!"),
        ("u://c", "2024-01-01 00:02:00",
         "a completely different payload with no shared shingles"),
    ]
    docs = spark.createDataFrame(rows, "url string, ts string, text string") \
        .withColumn("warc_ts", F.col("ts").cast("timestamp")).drop("ts")
    out = str(tmp_path / "wet")
    write_wet(docs, out)
    back = read_wet(spark, out)

    a = {(r.url, str(r.warc_ts), r.text) for r in docs.collect()}
    b = {(r.url, str(r.warc_ts), r.text) for r in back.collect()}
    assert b == a
    assert {r.n_chars for r in back.collect()} == \
        {len(t) for _, _, t in rows}

    dd = near_dedup(back, text_col="text", id_col="url",
                    min_exact_jaccard=0.7)
    got = {r.url: (r.keep_id, r.is_dup) for r in dd.collect()}
    assert got["u://b"] == ("u://a", True)   # near-dup collapsed
    assert got["u://c"] == ("u://c", False)
