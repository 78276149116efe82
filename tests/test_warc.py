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


def _record(typ, url, payload, ctype="text/html", clen=None):
    body = payload
    if clen is None:
        clen = len(body.encode())
    return (f"WARC/1.0\r\nWARC-Type: {typ}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2024-03-01T00:00:00Z\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {clen}\r\n\r\n{body}\r\n\r\n")


def test_warc_scan_is_all_jvm(spark, tmp_path):
    """The 100-TB front door has NO Python stage: neither a
    PythonRDD nor a BatchEvalPython/ArrowEvalPython node may appear
    in the WARC scan plan (round-5 verdict: the old
    newAPIHadoopFile framing shipped every record JVM->Python->JVM)."""
    from project_discord_knowledge_graph_spark.sources.warc import (
        read_wet,
    )
    pages = pages_df(spark, 20, seed=30)
    out = str(tmp_path / "warc")
    write_warc(pages, out)
    for df in (read_warc(spark, out), read_wet(spark, out)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan
        assert "Scan text" in plan or "FileScan" in plan, plan


def test_warc_gzip_members_end_to_end(spark, tmp_path):
    """Common Crawl's actual layout — one gzip member per record,
    concatenated — reads through the same scan (Hadoop multi-member
    GzipCodec) and feeds near_dedup end-to-end."""
    import gzip

    from project_discord_knowledge_graph_spark.operators.dataset import (
        near_dedup,
    )
    from project_discord_knowledge_graph_spark.sources.warc import (
        read_wet,
    )

    texts = {
        "u://a": "the quick brown fox jumps over the lazy dog tonight",
        "u://b": "the quick brown fox jumps over the lazy dog tonight!",
        "u://c": "a completely different payload with no shared shingles",
    }
    d = tmp_path / "wetgz"
    d.mkdir()
    with open(d / "part-0.wet.gz", "wb") as f:
        for url, t in texts.items():
            f.write(gzip.compress(
                _record("conversion", url, t,
                        ctype="text/plain").encode()))
    back = read_wet(spark, str(d))
    assert {(r.url, r.text) for r in back.collect()} == \
        set(texts.items())

    dd = near_dedup(back, text_col="text", id_col="url",
                    min_exact_jaccard=0.7)
    got = {r.url: (r.keep_id, r.is_dup) for r in dd.collect()}
    assert got["u://b"] == ("u://a", True)
    assert got["u://c"] == ("u://c", False)


def test_warc_http_payload_stripped(spark, tmp_path):
    """Real CC response records wrap the document in an HTTP
    response (Content-Type: application/http); read_warc must strip
    the status line + headers so html is the document alone."""
    doc = "<html><body>hello crawl</body></html>"
    http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(doc)}\r\n\r\n{doc}")
    d = tmp_path / "cc"
    d.mkdir()
    with open(d / "f.warc", "w", newline="") as f:
        f.write(_record("response", "u://h", http,
                        ctype="application/http; msgtype=response"))
        f.write(_record("response", "u://plain", doc))
    rows = {r.url: bytes(r.html).decode()
            for r in read_warc(spark, str(d)).collect()}
    assert rows == {"u://h": doc, "u://plain": doc}


def test_warc_content_length_quarantine(spark, tmp_path):
    """A payload containing the record delimiter splits the record;
    Content-Length catches the truncation and the row is quarantined
    (dropped by default, visible with on_length_mismatch='keep') —
    never silently emitted corrupt.  The spurious tail fragment has
    no WARC headers and is dropped by the type filter."""
    evil = ("before the fake header\r\n\r\nWARC/1.0\r\n"
            "and after it")
    good = "an honest payload"
    d = tmp_path / "split"
    d.mkdir()
    with open(d / "f.warc", "w", newline="") as f:
        f.write(_record("response", "u://evil", evil))
        f.write(_record("response", "u://good", good))

    got = read_warc(spark, str(d))
    assert {r.url for r in got.collect()} == {"u://good"}

    kept = read_warc(spark, str(d), on_length_mismatch="keep")
    assert {r.url for r in kept.collect()} == {"u://evil", "u://good"}

    import pytest
    with pytest.raises(ValueError):
        read_warc(spark, str(d), on_length_mismatch="explode")


def test_warc_non_utf8_payload_kept(spark, tmp_path):
    """The Content-Length guard is a TRUNCATION guard, not an
    equality check: a latin-1 (non-UTF-8) payload re-encodes LONGER
    (invalid bytes widen to U+FFFD), and the intact record must be
    KEPT — dropping it would be silent data loss on real crawls.
    The decode mangling itself is the documented utf-8 scope."""
    body = "caf\xe9 page".encode("latin-1")   # 0xE9: invalid UTF-8
    rec = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "WARC-Target-URI: u://latin\r\n"
           "WARC-Date: 2024-03-01T00:00:00Z\r\n"
           "Content-Type: text/html\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode() \
        + body + b"\r\n\r\n"
    d = tmp_path / "enc"
    d.mkdir()
    (d / "f.warc").write_bytes(rec)
    rows = read_warc(spark, str(d)).collect()
    assert [r.url for r in rows] == ["u://latin"]
    assert "caf" in bytes(rows[0].html).decode("utf-8")


def test_warc_http_lf_only_headers(spark, tmp_path):
    """Lenient servers end the HTTP header block with bare LF; the
    strip must fall back to \\n\\n instead of emitting html=''."""
    doc = "<html>lenient</html>"
    http = f"HTTP/1.1 200 OK\nContent-Type: text/html\n\n{doc}"
    d = tmp_path / "lf"
    d.mkdir()
    with open(d / "f.warc", "w", newline="") as f:
        f.write(_record("response", "u://lf", http,
                        ctype="application/http; msgtype=response"))
    rows = {r.url: bytes(r.html).decode()
            for r in read_warc(spark, str(d)).collect()}
    assert rows == {"u://lf": doc}
