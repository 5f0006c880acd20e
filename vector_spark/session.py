"""SparkSession builder tuned for the log-pipeline workload.

Defaults chosen for the sandbox (single JVM, local[N]) but expressed the
way a multi-executor cluster would want them: AQE on (runtime partition
coalescing + skew-join splitting), shuffle partitions sized to cores (not
the 200 default), UTC session timezone (Vector's timestamps are always
UTC — /root/reference/lib/vector-core/src/event/value.rs Timestamp is
DateTime<Utc>), Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` controls local parallelism (``local[cpus]``); default comes
    from $SPARK_GRAFT_CPUS, falling back to all cores. Shuffle
    partitions default to ~cores so tiny local runs aren't
    over-parallelized; at cluster scale you'd size this to
    data-volume / target-partition-size instead.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # pin GC parallelism to the task parallelism: the JVM defaults GC
        # threads to the HOST's logical cores (32 here), which thrashes a
        # local[N<32] run during frequent young collections
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:ParallelGCThreads={max(2, min(int(cpus), 8))} -XX:ConcGCThreads=2",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # last-write-wins for user-written map_concat expressions
        # (AddTags itself filters colliding keys and no longer needs it)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # shuffle files are only deleted when their ShuffleDependency is
        # GC'd; with a large heap the default 30min periodic GC lets a
        # long session accumulate the full history of shuffle spill on
        # local disk (measured: ~78 GB over a 46-min sf10 bench run →
        # ENOSPC). 2min bounds scratch usage at negligible GC cost.
        .config("spark.cleaner.periodicGC.interval", "2min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
