"""Streaming ingest + windowed aggregation, manifest repair, and
storage-level purge tests."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zikeiretsu_rs_spark.catalog.manifest import Manifest
from zikeiretsu_rs_spark.catalog.repair import purge_persisted, rebuild_manifest
from zikeiretsu_rs_spark.datamodel import DataPoint, FieldType
from zikeiretsu_rs_spark.datetime_util import NANOS_PER_DAY, NANOS_PER_SEC
from zikeiretsu_rs_spark.engine import Engine
from zikeiretsu_rs_spark.streaming.ingest import (
    start_streaming_ingest,
    streaming_sessionize,
    streaming_time_bucket,
)

from test_datetime_util import nanos


class TestStreamingIngest:
    def test_foreachbatch_persists_blocks(self, spark, tmp_ctx, tmp_path):
        engine = Engine(spark, tmp_ctx)
        store = engine.writable_store("stream_metrics", [FieldType.FLOAT64])

        src_dir = str(tmp_path / "src")
        schema = T.StructType(
            [
                T.StructField("ts", T.LongType()),
                T.StructField("f0", T.DoubleType()),
            ]
        )
        base = nanos(2024, 1, 1)
        spark.createDataFrame(
            [(base + i * NANOS_PER_SEC, float(i)) for i in range(10)], schema
        ).write.parquet(src_dir)

        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = start_streaming_ingest(
            stream, store, checkpoint_dir=str(tmp_path / "ckpt")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        # data landed as a block: queryable through the dialect
        df = engine.execute_to_df(
            "with format_datetime = false select * from stream_metrics "
            "where ts >= '2024-01-01'",
            now_nanos=base,
        )
        assert df.count() == 10
        assert store.manifest.load()  # manifest entry written

    def test_windowed_agg_with_watermark(self, spark):
        base = nanos(2024, 1, 1)
        schema = T.StructType(
            [
                T.StructField("ts", T.TimestampType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        import datetime as dt

        rows = [
            (dt.datetime(2024, 1, 1, 0, m), "click", 1.0) for m in (0, 1, 6, 7)
        ]
        src = spark.createDataFrame(rows, schema)
        # batch-mode evaluation of the streaming plan shape
        out = streaming_time_bucket(
            src, bucket="5 minutes", group_cols=["event_type"], value_col="value"
        )
        got = {r["bucket_start"].minute: r["n"] for r in out.collect()}
        assert got == {0: 2, 5: 2}

    def test_streaming_sessionize_shape(self, spark):
        import datetime as dt

        schema = T.StructType(
            [
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
            ]
        )
        rows = [
            (dt.datetime(2024, 1, 1, 0, 0), 1),
            (dt.datetime(2024, 1, 1, 0, 10), 1),
            (dt.datetime(2024, 1, 1, 2, 0), 1),
        ]
        out = streaming_sessionize(spark.createDataFrame(rows, schema), gap="30 minutes")
        rows = out.orderBy("session_start").collect()
        assert [r["n_events"] for r in rows] == [2, 1]


class TestRepairAndPurge:
    def _ingest(self, spark, tmp_ctx, days=3, per_day=4):
        engine = Engine(spark, tmp_ctx)
        store = engine.writable_store("m", [FieldType.FLOAT64])
        base = nanos(2024, 1, 1)
        pts = []
        for d in range(days):
            for i in range(per_day):
                pts.append(
                    DataPoint.new(base + d * NANOS_PER_DAY + i * NANOS_PER_SEC, float(d))
                )
        store.push_multi(pts)
        store.persist()
        return engine, store, base

    def test_rebuild_manifest_matches_data(self, spark, tmp_ctx):
        engine, store, base = self._ingest(spark, tmp_ctx)
        db_dir = tmp_ctx.db_dir()
        # corrupt: delete the manifest
        os.unlink(store.manifest.path)
        assert Manifest(db_dir, "m").load() == []
        entry = rebuild_manifest(spark, db_dir, "m")
        assert entry.rows == 12
        assert entry.since_nanos == base
        assert entry.distinct_ts == 12

    def test_purge_whole_and_boundary_partitions(self, spark, tmp_ctx):
        engine, store, base = self._ingest(spark, tmp_ctx)
        db_dir = tmp_ctx.db_dir()
        # purge [day0 12:00, day2 00:00): removes day1 dir entirely,
        # rewrites day0 keeping its rows (all before 12:00)
        purge_persisted(
            spark,
            db_dir,
            "m",
            base + NANOS_PER_DAY // 2,
            base + 2 * NANOS_PER_DAY,
        )
        df = engine.execute_to_df(
            "with format_datetime = false select * from m where ts >= '2023-01-01'",
            now_nanos=base,
        )
        vals = sorted(r["f0"] for r in df.collect())
        assert vals == [0.0] * 4 + [2.0] * 4  # day1 gone, day0+day2 intact
        block_dir = f"{db_dir}/block/m"
        assert "dt=2024-01-02" not in os.listdir(block_dir)
        # manifest rebuilt
        rng = Manifest(db_dir, "m").range()
        assert rng == (base, base + 2 * NANOS_PER_DAY + 3 * NANOS_PER_SEC)

    def test_purge_everything_leaves_empty_manifest(self, spark, tmp_ctx):
        """A purge covering the entire dataset must rebuild to an EMPTY
        manifest (not abort on an unreadable empty dir and leave the
        manifest listing phantom purged blocks)."""
        engine, store, base = self._ingest(spark, tmp_ctx)
        db_dir = tmp_ctx.db_dir()
        purge_persisted(spark, db_dir, "m", base - NANOS_PER_DAY, base + 10 * NANOS_PER_DAY)
        assert Manifest(db_dir, "m").load() == []
        assert Manifest(db_dir, "m").range() is None

    def test_purge_mid_partition_rewrites(self, spark, tmp_ctx):
        engine, store, base = self._ingest(spark, tmp_ctx, days=1, per_day=10)
        db_dir = tmp_ctx.db_dir()
        purge_persisted(
            spark,
            db_dir,
            "m",
            base + 2 * NANOS_PER_SEC,
            base + 5 * NANOS_PER_SEC,
        )
        df = engine.execute_to_df(
            "with format_datetime = false select * from m where ts >= '2023-01-01'",
            now_nanos=base,
        )
        assert df.count() == 7
