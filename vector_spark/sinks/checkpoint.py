"""Per-partition checkpointed, idempotently-resumable pipeline runs.

Rebuilds the contract of Vector's file-source checkpointer
(/root/reference/lib/file-source/src/checkpointer.rs:18-67): progress is
persisted as a small JSON document written via atomic tmp-file swap
(write `checkpoints.json.tmp`, fsync, rename), keyed by a stable
fingerprint of the input unit, so a crashed/killed run resumes exactly
where it left off and never double-counts.

Our unit of progress is an *input partition* (a `source=<v>` directory of
the corpus — the Iceberg-partition stand-in), not a byte offset: Spark
jobs are restartable per partition, and each sink write is
overwrite-by-partition-directory, so re-running a partition is
idempotent (the Iceberg `overwritePartitions` contract).

Each checkpoint record carries lineage + throughput metrics per the
north rule:
    {partition_id, status, input_snapshot, rows_in, rows_routed,
     lane_counts, wall_ms, rows_per_sec, run_id, finished_at}

At 100 TB the loop shape holds: partitions are processed as independent
jobs (optionally several in flight), state lives in a tiny driver-side
document (or a metadata table), and a resume is O(#partitions) planning
work, not O(data).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fingerprint(path: str) -> str:
    """Stable fingerprint of one input-partition directory: sorted
    (name, size, mtime_ns) of its data files. On a real cluster this
    would be the Iceberg snapshot id + partition value; local-fs stat is
    the sandbox equivalent (same role as the file source's CRC
    fingerprint, checkpointer.rs:42-47)."""
    entries = []
    for name in sorted(os.listdir(path)):
        if name.startswith(("_", ".")):
            continue
        st = os.stat(os.path.join(path, name))
        entries.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(entries)


@dataclass
class CheckpointManager:
    """Atomic-swap JSON checkpoint document, one record per partition."""

    ckpt_dir: str
    state: dict[str, dict] = field(default_factory=dict)

    def __post_init__(self) -> None:
        os.makedirs(self.ckpt_dir, exist_ok=True)
        if os.path.exists(self._path):
            with open(self._path) as f:
                self.state = json.load(f)

    @property
    def _path(self) -> str:
        return os.path.join(self.ckpt_dir, "checkpoints.json")

    def is_done(self, partition_id: str, input_snapshot: str) -> bool:
        rec = self.state.get(partition_id)
        return (
            rec is not None
            and rec.get("status") == "done"
            and rec.get("input_snapshot") == input_snapshot
        )

    def record(self, partition_id: str, **fields) -> None:
        self.state[partition_id] = {"partition_id": partition_id, **fields}
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path)  # atomic swap, checkpointer.rs:61-67


def list_input_partitions(input_path: str) -> dict[str, str]:
    """Map partition_id -> directory for a hive-partitioned corpus dir.
    Falls back to one whole-input partition for unpartitioned inputs."""
    parts = {
        name: os.path.join(input_path, name)
        for name in sorted(os.listdir(input_path))
        if "=" in name and os.path.isdir(os.path.join(input_path, name))
    }
    return parts or {"_all": input_path}


@dataclass
class CheckpointedResult:
    lane_counts: dict[str, int] = field(default_factory=dict)
    metrics: dict[str, list] = field(default_factory=dict)
    partitions_run: list[str] = field(default_factory=list)
    partitions_skipped: list[str] = field(default_factory=list)

    @property
    def rows_routed(self) -> int:
        return sum(self.lane_counts.values())


def run_with_checkpoint(
    spark: SparkSession,
    input_path: str,
    enrichment: DataFrame | None,
    out_dir: str,
    ckpt_dir: str,
    salted: bool = True,
) -> CheckpointedResult:
    """Run the flagship topology partition-by-partition with resume.

    Layout: `{out_dir}/part={pid}/lane={name}/{data,metrics}` so each
    partition's write is an independent overwrite (idempotent rerun).
    """
    from vector_spark.plans.pipeline import run_pipeline

    ckpt = CheckpointManager(ckpt_dir)
    run_id = uuid.uuid4().hex[:12]
    result = CheckpointedResult()

    for pid, pdir in list_input_partitions(input_path).items():
        snap = _fingerprint(pdir)
        if ckpt.is_done(pid, snap):
            result.partitions_skipped.append(pid)
            rec = ckpt.state[pid]
            for lane, n in rec.get("lane_counts", {}).items():
                result.lane_counts[lane] = result.lane_counts.get(lane, 0) + n
            # metrics are persisted in the record so a resumed run's
            # result is complete, not just its counts
            for lane, rows in rec.get("metrics", {}).items():
                result.metrics.setdefault(lane, []).extend(tuple(r) for r in rows)
            continue

        t0 = time.time()
        df = spark.read.parquet(pdir)
        # hive layout strips the partition column from the files; restore it
        if "=" in pid:
            col, val = pid.split("=", 1)
            if col not in df.columns:
                df = df.withColumn(col, F.lit(val))
        ckpt.record(pid, status="running", input_snapshot=snap, run_id=run_id)
        part_out = f"{out_dir}/part={pid}"
        r = run_pipeline(spark, df, enrichment=enrichment, out_dir=part_out, salted=salted)
        wall_ms = int((time.time() - t0) * 1000)
        # run_pipeline counts rows_in on its cached parse; the fallback
        # count only triggers for layouts that never materialize one
        rows_in = r.rows_in or df.count()
        ckpt.record(
            pid,
            status="done",
            input_snapshot=snap,
            run_id=run_id,
            rows_in=rows_in,
            rows_routed=r.rows_routed,
            lane_counts=r.lane_counts,
            metrics={lane: [list(m) for m in rows] for lane, rows in r.metrics.items()},
            wall_ms=wall_ms,
            rows_per_sec=round(rows_in * 1000.0 / max(wall_ms, 1), 1),
            finished_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        )
        result.partitions_run.append(pid)
        for lane, n in r.lane_counts.items():
            result.lane_counts[lane] = result.lane_counts.get(lane, 0) + n
        for lane, m in r.metrics.items():
            result.metrics.setdefault(lane, []).extend(m)
    return result
