"""Block compaction — the operation the reference explicitly lacks
("merging block files is not supported yet",
storage/api/write.rs:253-258): every persist() appends one file per
partition, so a long-running ingest accumulates small files. At scale
the small-file problem dominates scan cost (per-file open/footer
overhead, tiny row groups defeat min/max skipping, task-per-file
scheduling) — compaction is what keeps a streaming-ingested warehouse
scannable.

Strategy: per `dt=` partition, if the file count exceeds the
threshold, rewrite the partition as ceil(bytes / target_file_bytes)
sorted files (sort by ts restores the sorted-block invariant across
the merged files, re-enabling row-group range skipping). The rewrite
is atomic per partition (write to a sibling dir, swap); the manifest
is rebuilt afterwards. Readers racing a swap re-list on retry — same
contract as the reference's read-repair.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..datamodel import PARTITION_COLUMN, TS_COLUMN
from . import fsio
from .lockfile import metrics_lock, new_writer_id
from .repair import rebuild_manifest


@dataclass
class CompactionStats:
    partitions_compacted: int
    files_before: int
    files_after: int


def _data_files(part_dir: str) -> list[str]:
    return [
        f
        for f in os.listdir(part_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def _recover_interrupted(block_dir: str) -> None:
    """Roll forward/back partitions left by a crash mid-swap: a
    `_old_` dir with no live partition is renamed back; stale `_old_`/
    `_compact_` leftovers beside a live partition are dropped."""
    for name in sorted(os.listdir(block_dir)):
        path = os.path.join(block_dir, name)
        if name.startswith("_old_"):
            live = os.path.join(block_dir, name[len("_old_"):])
            if os.path.isdir(live):
                shutil.rmtree(path)
            else:
                os.replace(path, live)
        elif name.startswith("_compact_"):
            shutil.rmtree(path)


def compact_metrics(
    spark: SparkSession,
    db_dir: str,
    metrics: str,
    target_file_bytes: int = 128 << 20,
    min_files_to_compact: int = 2,
    lock_timeout_sec: float = 30.0,
) -> CompactionStats:
    """Compact every `dt=` partition of a metrics dataset whose file
    count is >= min_files_to_compact. Idempotent; safe to run on a
    schedule alongside ingest (each partition swap is atomic, and the
    per-metrics lockfile serializes the run against concurrent
    writers — T5; compaction is schedulable so it polls by default
    rather than failing fast)."""
    block_dir = fsio.as_local(f"{db_dir}/block/{metrics}", "compaction")
    stats = CompactionStats(0, 0, 0)
    if not os.path.isdir(block_dir):
        return stats
    with metrics_lock(db_dir, metrics, new_writer_id(), lock_timeout_sec):
        return _compact_locked(
            spark, db_dir, metrics, block_dir, stats,
            target_file_bytes, min_files_to_compact,
        )


def _compact_locked(
    spark, db_dir, metrics, block_dir, stats, target_file_bytes, min_files_to_compact
) -> CompactionStats:
    _recover_interrupted(block_dir)
    for name in sorted(os.listdir(block_dir)):
        if not name.startswith(f"{PARTITION_COLUMN}="):
            continue
        part_dir = os.path.join(block_dir, name)
        files = _data_files(part_dir)
        stats.files_before += len(files)
        if len(files) < min_files_to_compact:
            stats.files_after += len(files)
            continue
        total_bytes = sum(
            os.path.getsize(os.path.join(part_dir, f)) for f in files
        )
        n_out = max(1, -(-total_bytes // target_file_bytes))
        compacted = (
            spark.read.parquet(part_dir)
            .repartitionByRange(n_out, TS_COLUMN)
            .sortWithinPartitions(TS_COLUMN)
        )
        # underscore-prefixed siblings: Spark's file discovery and the
        # `dt=*` partition listings both skip `_`-named paths, so a
        # crash can never surface a half-swapped dir as a partition
        tmp_dir = os.path.join(block_dir, "_compact_" + name)
        compacted.write.mode("overwrite").parquet(tmp_dir)
        # two renames instead of rmtree-then-rename: a crash between
        # them leaves the data under `_old_`, recovered below — never a
        # window with the partition missing entirely
        old_dir = os.path.join(block_dir, "_old_" + name)
        os.replace(part_dir, old_dir)
        os.replace(tmp_dir, part_dir)
        shutil.rmtree(old_dir)
        stats.partitions_compacted += 1
        stats.files_after += len(_data_files(part_dir))
    if stats.partitions_compacted:
        rebuild_manifest(spark, db_dir, metrics)
    return stats
