"""Local emulation of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf and compares it
against oracle_sql() via DuckDB: row count, sorted column names, and
exact multiset equality of values (strictest interpretation — if this
passes, any order-insensitive value hash passes).

Usage: python tools/check_entry.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from nexlt_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main(sf_dir: str):
    spark = get_spark(app_name="check-entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sms = rows_to_multiset(scols, srows)
        dms = rows_to_multiset(dcols, drows)
        ok_vals = sms == dms
        if ok_cols and ok_count and ok_vals:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: cols={ok_cols} ({scols} vs {dcols}) "
                f"count={ok_count} ({len(srows)} vs {len(drows)}) vals={ok_vals}"
            )
            if not ok_vals:
                diff_a = [r for r in sms if r not in dms][:3]
                diff_b = [r for r in dms if r not in sms][:3]
                print(f"  spark-only: {diff_a}")
                print(f"  duckdb-only: {diff_b}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(qs)} total")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
