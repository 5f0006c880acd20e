#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() on the same parquet
tables, compare row-count + sorted-by-name schema + order-insensitive
values. Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from vector_spark.session import get_spark

    spark = get_spark("oracle_check", cpus=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows, schema={s_cols} ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        status = []
        if len(s_rows) != len(d_rows):
            status.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
            status.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not status:
            rs, rd = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
            if rs != rd:
                diff = [(a, b) for a, b in zip(rs, rd) if a != b][:3]
                status.append(f"values differ, first diffs: {diff}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"OK   {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
