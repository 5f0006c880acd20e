"""Table sink abstraction: Iceberg writer with a parquet stand-in.

The north rule's sink contract is Iceberg tables with idempotent
partition replacement (`overwritePartitions`). This image carries no
Iceberg jars, so the sink is a config switch:

- ``IcebergSink`` — the real thing: `df.writeTo(table).overwritePartitions()`
  (atomic snapshot commit; a re-run of the same partition replaces it,
  which is what makes the checkpoint loop idempotent). Usable as soon
  as the session has an Iceberg catalog; constructing it without one
  raises immediately rather than failing mid-job.
- ``ParquetSink`` — sandbox stand-in with the SAME contract surface:
  dynamic partition overwrite (`partitionOverwriteMode=dynamic`)
  replaces exactly the partitions present in the written DataFrame,
  mirroring overwritePartitions semantics on a plain directory layout.

Everything upstream programs against ``TableSink.write(df, dest,
partition_by)`` so swapping formats is configuration, not code.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


class TableSink:
    """write(df, dest, partition_by): replace dest's matching partitions."""

    def write(self, df: DataFrame, dest: str, partition_by: list[str] | None = None) -> None:
        raise NotImplementedError


@dataclass
class ParquetSink(TableSink):
    """Partition-replacing parquet writer (Iceberg-contract stand-in).

    mode="overwrite_partitions" (default) uses dynamic partition
    overwrite: only partitions present in `df` are replaced — matching
    Iceberg's overwritePartitions. mode="overwrite" truncates dest.
    """

    mode: str = "overwrite_partitions"

    def write(self, df: DataFrame, dest: str, partition_by: list[str] | None = None) -> None:
        writer = df.write
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if self.mode == "overwrite_partitions" and partition_by:
            writer = writer.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        else:
            writer = writer.mode("overwrite")
        writer.parquet(dest)


@dataclass
class IcebergSink(TableSink):
    """Iceberg table writer: dest is a catalog table name.

    Requires an Iceberg catalog on the session (spark.sql.catalog.*);
    verified at construction so a misconfigured cluster fails fast.
    """

    spark: "object"
    create_if_missing: bool = True

    def __post_init__(self) -> None:
        confs = self.spark.sparkContext.getConf().getAll()
        if not any(k.startswith("spark.sql.catalog.") for k, _ in confs):
            raise RuntimeError(
                "IcebergSink needs an Iceberg catalog (spark.sql.catalog.<name>); "
                "none configured — use ParquetSink in jar-less environments"
            )

    def write(self, df: DataFrame, dest: str, partition_by: list[str] | None = None) -> None:
        wt = df.writeTo(dest)
        if self.spark.catalog.tableExists(dest):
            wt.overwritePartitions()
        elif self.create_if_missing:
            if partition_by:
                from pyspark.sql import functions as F

                wt = wt.partitionedBy(*[F.col(c) for c in partition_by])
            wt.create()
        else:
            raise RuntimeError(f"Iceberg table {dest} does not exist")


def sink_for(kind: str, spark=None) -> TableSink:
    """Config switch: 'parquet' | 'iceberg'."""
    if kind == "parquet":
        return ParquetSink()
    if kind == "iceberg":
        return IcebergSink(spark)
    raise KeyError(f"unknown sink kind {kind!r}")
