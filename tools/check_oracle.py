#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() on the same parquet
tables, compare row-count + sorted-by-name schema + order-insensitive
values. Usage: python tools/check_oracle.py [--json out.json] [sf_dir]
[query ...]

--json additionally writes a CORRECTNESS-shaped artifact covering the
FULL query registry (the driver's own artifact is frozen at its round-1
query list): {name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}, with rows-only entries marked "no_oracle": true.
"""

from __future__ import annotations

import json
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
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}

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
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None, "err": f"spark: {e}"[:500],
            }
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            report[name] = {
                "no_oracle": True, "spark_rows": len(s_rows), "err": None,
            }
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows, schema={s_cols} ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(s_rows), "oracle_rows": None, "err": f"duckdb: {e}"[:500],
            }
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        rows_match = len(s_rows) == len(d_rows)
        schema_match = sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols)
        hash_match = False
        status = []
        if not rows_match:
            status.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not schema_match:
            status.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not status:
            rs, rd = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
            hash_match = rs == rd
            if not hash_match:
                diff = [(a, b) for a, b in zip(rs, rd) if a != b][:3]
                status.append(f"values differ, first diffs: {diff}")
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(s_rows),
            "oracle_rows": len(d_rows), "err": None,
        }
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"OK   {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} pass")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} rows)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
