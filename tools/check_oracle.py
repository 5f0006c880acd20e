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


def _cell_close(a: str, b: str, rel_tol: float) -> bool:
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return False
    return math.isclose(fa, fb, rel_tol=rel_tol, abs_tol=rel_tol)


_FLOAT_CELL = None  # compiled lazily


def _float_free_key(row):
    """Sort key that ignores float-formatted cells (norm_cell renders
    floats as %.6f, ints without a decimal point): rows whose float
    cells differ by rounding (different f64 accumulation orders round
    a .xxxx5 boundary differently) must still PAIR UP for the tolerant
    compare — sorting on the float cell would misalign the whole tail."""
    global _FLOAT_CELL
    if _FLOAT_CELL is None:
        import re

        _FLOAT_CELL = re.compile(r"^-?\d+\.\d{6}$")
    return tuple("" if isinstance(c, str) and _FLOAT_CELL.match(c) else c for c in row)


def rowsets_close(rs, rd, rel_tol: float) -> bool:
    """Tolerant compare for scale tiers: exact (%.6f) agreement on a
    1e11-magnitude SUM demands 1e-17 relative precision, beyond what
    differing accumulation orders (Spark partial aggs vs DuckDB) can
    deliver — and a ROUNDED f64 (e.g. round(cos, 4)) can differ by one
    unit in the last place when the pre-rounding values straddle a
    .xxxx5 boundary. Rows pair up by a float-insensitive sort; float
    cells then compare with relative tolerance. Only used when
    --rel-tol is passed, and the artifact records both the tolerance
    and which rows passed tolerantly."""
    if len(rs) != len(rd):
        return False
    rs = sorted(rs, key=_float_free_key)
    rd = sorted(rd, key=_float_free_key)
    return all(
        len(a) == len(b) and all(_cell_close(x, y, rel_tol) for x, y in zip(a, b))
        for a, b in zip(rs, rd)
    )


def _py_oracle_pack_fill_compare(spark, sf_dir):
    """Driver-side oracle for pack_fill_compare (the mutable bin scan is
    not SQL-expressible): re-derive next-fit and FFD fills in plain
    Python over the same (doc_id, n_tok, shard) input. Only the shard
    hash is taken from Spark (pmod(xxhash64) has no portable SQL twin);
    the packing itself — the logic under test — is an independent
    reimplementation of training/packing.py's sweep."""
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.col("n_chars").alias("n_tok"),
            F.pmod(F.xxhash64("doc_id"), F.lit(4)).alias("shard"),
        )
        .toPandas()
    )
    max_len = 2048
    out = []
    for strat in ("next_fit", "ffd"):
        fills_all = []  # final fill per pack across shards
        for _, grp in docs.groupby("shard"):
            if strat == "next_fit":
                seq = grp.sort_values("doc_id")["n_tok"]
                fills, cur = [], 0
                first = True
                for n in seq:
                    n = int(n)
                    if not first and cur + n > max_len:
                        fills.append(cur)
                        cur = 0
                    first = False
                    cur += n
                fills.append(cur)
            else:
                seq = grp.sort_values(["n_tok", "doc_id"],
                                      ascending=[False, True])["n_tok"]
                fills = []
                for n in seq:
                    n = int(n)
                    for b in range(len(fills)):
                        if fills[b] + n <= max_len:
                            fills[b] += n
                            break
                    else:
                        fills.append(n)
            fills_all.extend(fills)
        n_packs = len(fills_all)
        total = sum(fills_all)
        avg_fill = round(sum(round(f / max_len, 4) for f in fills_all) / n_packs, 4)
        out.append((strat, n_packs, total, avg_fill))
    return ["strategy", "n_packs", "total_tok", "avg_fill"], out


# driver-side Python oracles for queries whose semantics SQL can't
# express (mutable scans); compared with the same rowset machinery
PY_ORACLES = {"pack_fill_compare": _py_oracle_pack_fill_compare}


def main():
    argv = sys.argv[1:]
    json_out = None
    rel_tol = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--rel-tol" in argv:
        i = argv.index("--rel-tol")
        rel_tol = float(argv[i + 1])
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
        if name not in oracles and name not in PY_ORACLES:
            report[name] = {
                "no_oracle": True, "spark_rows": len(s_rows), "err": None,
            }
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows, schema={s_cols} ({time.time()-t0:.1f}s)")
            continue
        try:
            if name in PY_ORACLES:
                d_cols, d_rows = PY_ORACLES[name](spark, sf_dir)
            else:
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
        tol_match = False
        if not status:
            rs, rd = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
            hash_match = rs == rd
            if not hash_match and rel_tol is not None:
                tol_match = rowsets_close(rs, rd, rel_tol)
            if not hash_match and not tol_match:
                diff = [(a, b) for a, b in zip(rs, rd) if a != b][:3]
                status.append(f"values differ, first diffs: {diff}")
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(s_rows),
            "oracle_rows": len(d_rows), "err": None,
        }
        if tol_match:
            report[name]["tol_match"] = True
            report[name]["rel_tol"] = rel_tol
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        elif tol_match:
            print(f"OK~  {name}: {len(s_rows)} rows (rel_tol={rel_tol}, {time.time()-t0:.1f}s)")
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
