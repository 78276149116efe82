"""Builder-run FULL oracle sweep: every queries() entry vs its
oracle_sql() in DuckDB, regardless of registry position.

The round driver snapshots only the first 50 QUERIES entries into
CORRECTNESS_r{N}.json; this script is the companion artifact that puts
ALL registered queries on record every round (the 12 entries past the
cap included).  Comparison mirrors the driver: row count, column-name
set, and an order-insensitive multiset of canonicalized rows (reported
as one md5 over the sorted rows, so two engines' hashes are directly
comparable).

Usage:
    PYTHONPATH=. python scripts/check_oracles.py \
        [--sf /root/testdata/sf0.01] [--out CORRECTNESS_full.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _multiset_hash(cols: list[str], rows: list[tuple]) -> str:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("\x1f".join(_canon(r[i]) for i in idx) for r in rows)
    h = hashlib.md5()
    for line in canon:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "KG_CHECK_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="CORRECTNESS_full.json")
    ap.add_argument("--master", default="local[16]")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from project_discord_knowledge_graph_spark.session import get_spark

    spark = get_spark("check-oracles", master=args.master,
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single-file tables; make_sf writes Spark
        # parquet DIRECTORIES — glob the parts in that case
        p = f"{args.sf}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries, oracles = entry.queries(), entry.oracle_sql()
    report: dict[str, dict] = {}
    n_pass = 0
    t_start = time.time()
    for name, fn in queries.items():
        row: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        try:
            sdf = fn(spark, args.sf)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(s_rows)
            if name not in oracles:
                # no oracle (non-SQL-expressible operator): the query
                # RAN but was not value-verified — recorded as such,
                # never counted in n_pass
                row["no_oracle"] = True
                report[name] = row
                print(f"  {name}: no-oracle "
                      f"({row['spark_rows']} rows, ran only)",
                      file=sys.stderr)
                continue
            res = con.execute(oracles[name])
            d_cols = [d[0].lower() for d in res.description]
            d_rows = res.fetchall()
            row["oracle_rows"] = len(d_rows)
            row["rows_match"] = len(s_rows) == len(d_rows)
            row["schema_match"] = sorted(s_cols) == sorted(d_cols)
            row["hash_match"] = (
                _multiset_hash(s_cols, s_rows)
                == _multiset_hash(d_cols, d_rows))
            if row["rows_match"] and row["schema_match"] \
                    and row["hash_match"]:
                n_pass += 1
        except Exception as exc:  # noqa: BLE001 — artifact records it
            row["err"] = f"{type(exc).__name__}: {exc}"[:500]
        report[name] = row
        status = "ok" if row["err"] is None and row.get("hash_match",
                                                        True) else "FAIL"
        print(f"  {name}: {status} ({row['spark_rows']} rows)",
              file=sys.stderr)

    n_no_oracle = sum(1 for r in report.values() if r.get("no_oracle"))
    out = {"_meta": {"sf": args.sf, "n_queries": len(queries),
                     "n_pass": n_pass, "n_no_oracle": n_no_oracle,
                     "wall_sec": round(time.time() - t_start, 1)}}
    out.update(report)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["_meta"]))
    spark.stop()
    # success = every ORACLE-BACKED query verified and every
    # oracle-less query at least ran without error
    failed = len(queries) - n_pass - sum(
        1 for r in report.values()
        if r.get("no_oracle") and r["err"] is None)
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
