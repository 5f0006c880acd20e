#!/usr/bin/env python
"""Synthesize a larger copy of a driver testdata dir for scale proofs.

The driver's parquet dirs stop at sf0.1; the scale claims in SURVEY/
VERDICT are plan-shape arguments until actually run a decade up. This
tool materializes sf(0.1 x F) deterministically from sf0.1 — no
external data, reproducible bit-for-bit for a given (src, factor):

- every fact table is replicated F times into DISJOINT key ranges
  (new_key = old_key + c * (max_key+1), applied consistently across
  referencing tables), so each copy joins exactly like the original —
  the data gets BIGGER, not denser: per-key fan-outs, group sizes and
  join selectivities all match the source;
- `region`/`nation` stay fixed (TPC-H dimension semantics);
- `events` timestamps shift by c * (span + 1h) per copy — longer
  retention, not a denser firehose: window/session key cardinality
  scales with rows, per-window density stays constant;
- `documents` copy 0 is verbatim; copy c>0 splices the first half of
  doc i with the second half of a hash-picked partner — word/length
  distributions preserved, and each original gains F-1 moderate-overlap
  relatives (Jaccard ~1/3), i.e. a REALISTIC near-dup tail for the
  dedup operators instead of degenerate exact clones;
- `embeddings` copy 0 is verbatim; copy c>0 blends vec i with a
  hash-picked partner (alpha in [0.55, 0.95]) — realistic high-cosine
  neighborhoods for SemDeDup/ANN without exact duplicates.

Output layout matches the driver's exactly (one FILE per table named
{t}.parquet), so bench.py, check_oracle.py, and DuckDB all read it
unchanged:

    python tools/make_scale_data.py --factor 10 --out /tmp/sfscale/sf1.0
    SPARK_GRAFT_SF_DIR=/tmp/sfscale/sf1.0 python bench.py
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _copies(df: DataFrame, factor: int) -> DataFrame:
    """Cross the table with copy index c = 0..F-1 (narrow explode)."""
    return df.withColumn("__c", F.explode(F.array(*[F.lit(c) for c in range(factor)])))


def _shift(col: str, base: int):
    return (F.col(col) + F.col("__c") * F.lit(base)).alias(col)


def _hash01(*cols) -> F.Column:
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000)) / 1_000_000.0)


def scale_table(spark, name: str, src_dir: str, factor: int) -> DataFrame:
    df = spark.read.parquet(f"{src_dir}/{name}.parquet")
    if name in ("region", "nation") or factor == 1:
        return df

    def base(key: str, table: str | None = None) -> int:
        d = df if table is None else spark.read.parquet(f"{src_dir}/{table}.parquet")
        return int(d.agg(F.max(key)).first()[0]) + 1

    if name == "customer":
        out = _copies(df, factor).select(
            _shift("c_custkey", base("c_custkey")),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        )
    elif name == "supplier":
        out = _copies(df, factor).select(
            _shift("s_suppkey", base("s_suppkey")), "s_name", "s_nationkey", "s_acctbal"
        )
    elif name == "part":
        out = _copies(df, factor).select(
            _shift("p_partkey", base("p_partkey")),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        )
    elif name == "orders":
        out = _copies(df, factor).select(
            _shift("o_orderkey", base("o_orderkey")),
            _shift("o_custkey", base("c_custkey", "customer")),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
    elif name == "lineitem":
        out = _copies(df, factor).select(
            _shift("l_orderkey", base("o_orderkey", "orders")),
            _shift("l_partkey", base("p_partkey", "part")),
            _shift("l_suppkey", base("s_suppkey", "supplier")),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )
    elif name == "events":
        span = df.agg(
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("s")
        ).first()["s"]
        shift_s = int(span) + 3600
        out = _copies(df, factor).select(
            _shift("event_id", base("event_id")),
            (
                F.col("ts")
                + F.expr(f"make_interval(0, 0, 0, 0, 0, 0, __c * {shift_s})")
            ).alias("ts"),
            _shift("user_id", base("user_id")),
            "event_type", "value", "props",
        )
    elif name == "documents":
        n = base("doc_id")
        c = _copies(df, factor)
        partner_id = F.pmod(F.xxhash64("doc_id", "__c", F.lit("splice")), F.lit(n))
        a = c.select("doc_id", "__c", "text", "lang", "source", partner_id.alias("__p"))
        b = df.select(F.col("doc_id").alias("__p"), F.col("text").alias("__ptext"))
        wa, wb = F.split(F.col("text"), " "), F.split(F.col("__ptext"), " ")
        spliced = F.concat_ws(
            " ",
            F.concat(
                F.slice(wa, 1, (F.size(wa) + 1) / F.lit(2)),
                F.slice(wb, (F.size(wb) / F.lit(2)) + 1, F.size(wb)),
            ),
        )
        text = F.when(F.col("__c") == 0, F.col("text")).otherwise(spliced)
        out = a.join(b, "__p").select(
            _shift("doc_id", n),
            text.alias("text"),
            "lang", "source",
            F.length(text).alias("n_chars"),
        )
    elif name == "embeddings":
        n = base("vec_id")
        c = _copies(df, factor)
        partner_id = F.pmod(F.xxhash64("vec_id", "__c", F.lit("blend")), F.lit(n))
        a = c.select("vec_id", "__c", "embedding", "label", partner_id.alias("__p"))
        b = df.select(F.col("vec_id").alias("__p"), F.col("embedding").alias("__pemb"))
        alpha = (F.lit(0.55) + F.lit(0.4) * _hash01("vec_id", "__c")).cast("float")
        blended = F.zip_with(
            "embedding", "__pemb",
            lambda x, y: (alpha * x + (F.lit(1.0).cast("float") - alpha) * y).cast("float"),
        )
        emb = F.when(F.col("__c") == 0, F.col("embedding")).otherwise(blended)
        out = a.join(b, "__p").select(
            _shift("vec_id", n), emb.alias("embedding"), "label"
        )
    else:
        raise ValueError(name)
    return out.drop("__c")


def write_single_file(df: DataFrame, path: str) -> None:
    """One FILE per table (the driver's layout) so DuckDB's
    '{t}.parquet' single-path reads work unchanged."""
    tmp = path + ".tmpdir"
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    if os.path.exists(path):
        os.remove(path)
    shutil.move(part, path)
    shutil.rmtree(tmp, ignore_errors=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vector_spark.session import get_spark

    spark = get_spark("make_scale_data", cpus=args.cpus)
    os.makedirs(args.out, exist_ok=True)
    for t in TABLES:
        df = scale_table(spark, t, args.src, args.factor)
        write_single_file(df, os.path.join(args.out, f"{t}.parquet"))
        print(f"{t}: written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
