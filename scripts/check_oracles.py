"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at a given SF and compare against
``oracle_sql()`` via DuckDB — row count, column names, and an
order-insensitive multiset of normalized values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from citation_graph_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_value(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check-oracles", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        ok_count = len(spark_rows) == len(duck_rows)
        ns, nd = norm_rows(spark_cols, spark_rows), norm_rows(duck_cols, duck_rows)
        ok_vals = ns == nd
        status = "OK  " if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: spark={len(spark_rows)} duck={len(duck_rows)} "
            f"cols={'ok' if ok_cols else f'{spark_cols} vs {duck_cols}'} "
            f"vals={'ok' if ok_vals else 'MISMATCH'} [{time.time()-t0:.1f}s]"
        )
        if not ok_vals and ok_count and ok_cols:
            for a, b in zip(ns, nd):
                if a != b:
                    print(f"      first diff:\n      spark={a}\n      duck ={b}")
                    break
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
