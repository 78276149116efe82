"""Driver-mimicking correctness harness: every queries() entry runs in
Spark AND its oracle_sql() runs in DuckDB over the same parquet; the
results must agree on row count, column names, and an
order-insensitive multiset of stringified rows."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("KG_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _rows_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")
    sm = _rows_multiset(spark_cols, spark_rows)
    dm = _rows_multiset(duck_cols, duck_rows)
    if sm != dm:
        diff_s = [r for r in sm if r not in dm][:5]
        diff_d = [r for r in dm if r not in sm][:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={diff_s} duck-only={diff_d}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subject", "predicate", "object",
                               "message_id", "confidence"}


def test_zs_empty_predicate_matches_python_isspace(duck):
    """The zero-shot oracle's whitespace-only predicate claims
    char-for-char agreement with pandas .str.strip() (= Python
    str.isspace): verify over every BMP codepoint Python considers
    whitespace, plus lookalikes Python does NOT (the predicate must
    not over-match), plus NULL/empty/mixed cases."""
    from project_discord_knowledge_graph_spark.entry_queries import (
        _ZS_EMPTY,
    )

    py_ws = [chr(c) for c in range(0x10000) if chr(c).isspace()]
    non_ws = ["​", "﻿", "a", "0", ".", "­"]  # zero-width
    cases = ([None, "", "a b"] + py_ws + non_ws
             + [w + "x" + w for w in py_ws[:8]]
             + ["".join(py_ws[:10])])
    param_sql = "SELECT " + _ZS_EMPTY \
        .replace("t IS NULL", "? IS NULL") \
        .replace("regexp_replace(t,", "regexp_replace(?,")
    for t in cases:
        got = duck.execute(param_sql, [t, t]).fetchone()[0]
        want = t is None or t.strip() == ""
        assert got == want, (repr(t), got, want)
