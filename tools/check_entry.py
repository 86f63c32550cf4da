"""Driver-mimic: run every __spark_entry__ query vs its DuckDB oracle.

Compares row count, sorted column names, and an order-insensitive value
multiset (stringified, sorted rows). Usage:

    python tools/check_entry.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    return str(v)


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in idx) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from webcrawler_spark.session import get_spark

    spark = get_spark(app_name="check-entry", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            failures.append(name)
            continue
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows, {spark_s:.1f}s)")
            if len(s_rows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {exc}")
            failures.append(name)
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            ms = rows_to_multiset(s_cols, s_rows)
            md = rows_to_multiset(d_cols, d_rows)
            if ms != md:
                diff = [(a, b) for a, b in zip(ms, md) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs {diff}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(s_rows)} rows, {spark_s:.1f}s)")
        else:
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILED:", ", ".join(failures))
        return 1
    print("ALL PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
