"""Compaction: many small persist() blocks collapse into few sorted
files with identical data and a working manifest."""

import glob

from zikeiretsu_rs_spark.catalog.compact import compact_metrics
from zikeiretsu_rs_spark.catalog.manifest import Manifest
from zikeiretsu_rs_spark.datamodel import DataPoint, FieldType
from zikeiretsu_rs_spark.datetime_util import NANOS_PER_SEC
from zikeiretsu_rs_spark.engine import Engine

from test_datetime_util import nanos


def test_compact_merges_small_files(spark, tmp_ctx):
    engine = Engine(spark, tmp_ctx)
    store = engine.writable_store("m", [FieldType.FLOAT64])
    base = nanos(2024, 1, 1)
    # 5 separate persists -> >= 5 files in the same dt partition
    for i in range(5):
        store.push_multi(
            [DataPoint.new(base + (i * 10 + j) * NANOS_PER_SEC, float(i)) for j in range(4)]
        )
        store.persist()

    db_dir = tmp_ctx.db_dir()
    part_glob = f"{db_dir}/block/m/dt=2024-01-01/*.parquet"
    files_before = [f for f in glob.glob(part_glob) if "/_" not in f]
    assert len(files_before) >= 5

    before = spark.read.parquet(f"{db_dir}/block/m").orderBy("ts").collect()
    stats = compact_metrics(spark, db_dir, "m")
    after = spark.read.parquet(f"{db_dir}/block/m").orderBy("ts").collect()

    assert stats.partitions_compacted == 1
    assert stats.files_after < stats.files_before
    files_after = [f for f in glob.glob(part_glob) if "/_" not in f]
    assert len(files_after) == 1  # 20 tiny rows -> single target file
    assert before == after

    # manifest was rebuilt and still answers catalog queries
    entries = Manifest(db_dir, "m").load()
    assert sum(e.rows for e in entries) == 20

    # dialect query still works on the compacted dataset
    df = engine.execute_to_df(
        "with format_datetime = false select * from m where ts >= '2023-01-01'",
        now_nanos=base,
    )
    assert df.count() == 20


def test_compact_idempotent_and_threshold(spark, tmp_ctx):
    engine = Engine(spark, tmp_ctx)
    store = engine.writable_store("m2", [FieldType.FLOAT64])
    base = nanos(2024, 2, 1)
    store.push_multi([DataPoint.new(base + i * NANOS_PER_SEC, 1.0) for i in range(3)])
    store.persist()
    db_dir = tmp_ctx.db_dir()

    # single file -> below threshold -> untouched
    stats = compact_metrics(spark, db_dir, "m2")
    assert stats.partitions_compacted == 0
    assert stats.files_before == stats.files_after
