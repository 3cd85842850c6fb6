"""S5 object-store boundary: metadata IO via pyarrow.fs and the full
ingest -> persist -> query path against a file:// URI warehouse (the
same code path an s3://(s3a)/gs:// deployment takes — Spark handles
block data, fsio handles manifests/schemas). Rename-based maintenance
must refuse non-filesystem URIs early."""

import json
import os

import pytest

from zikeiretsu_rs_spark.catalog import fsio
from zikeiretsu_rs_spark.catalog.context import Database, DBContext
from zikeiretsu_rs_spark.catalog.manifest import Manifest
from zikeiretsu_rs_spark.datamodel import DataPoint, FieldType

NS = 10**9


class TestFsioPrimitives:
    def test_join(self):
        assert fsio.join("/a/b", "c", "d.json") == "/a/b/c/d.json"
        assert fsio.join("s3://bkt/w/", "c", "d.json") == "s3://bkt/w/c/d.json"

    def test_is_uri(self):
        assert fsio.is_uri("gs://x/y") and fsio.is_uri("file:///tmp/x")
        assert not fsio.is_uri("/tmp/x")

    def test_as_local(self):
        assert fsio.as_local("/tmp/x", "op") == "/tmp/x"
        assert fsio.as_local("file:///tmp/x", "op") == "/tmp/x"
        with pytest.raises(NotImplementedError, match="compaction requires"):
            fsio.as_local("s3://bkt/x", "compaction")

    def test_json_roundtrip_local_and_uri(self, tmp_path):
        doc = {"k": [1, 2, 3], "s": "x"}
        local = str(tmp_path / "sub" / "m.json")
        fsio.write_json_atomic(local, doc)
        assert fsio.read_json(local) == doc
        uri = f"file://{tmp_path}/sub2/m.json"
        fsio.write_json_atomic(uri, doc)
        assert fsio.exists(uri)
        assert fsio.read_json(uri) == doc
        # the URI write landed at the expected physical location
        with open(tmp_path / "sub2" / "m.json") as f:
            assert json.load(f) == doc

    def test_list_dir_names(self, tmp_path):
        """Epoch discovery for the streaming indexes must be URI-safe
        (ADVICE r06: os.listdir on an object-store store_dir silently
        returned no history)."""
        assert fsio.list_dir_names(str(tmp_path / "none"), "epoch=") == []
        assert fsio.list_dir_names(f"file://{tmp_path}/none", "epoch=") == []
        for e in (2, 0, 1):
            (tmp_path / "d" / f"epoch={e}").mkdir(parents=True)
        # noise: a FILE with the prefix and a dir without it
        (tmp_path / "d" / "epoch=9").write_text("")  # file, not dir
        (tmp_path / "d" / "other").mkdir()
        want = ["epoch=0", "epoch=1", "epoch=2"]
        assert fsio.list_dir_names(str(tmp_path / "d"), "epoch=") == want
        assert fsio.list_dir_names(f"file://{tmp_path}/d", "epoch=") == want

    def test_list_json_names(self, tmp_path):
        assert fsio.list_json_names(str(tmp_path / "none")) == []
        assert fsio.list_json_names(f"file://{tmp_path}/none") == []
        for n in ("b", "a"):
            fsio.write_json_atomic(str(tmp_path / "d" / f"{n}.json"), {})
        (tmp_path / "d" / "noise.txt").write_text("x")
        assert fsio.list_json_names(str(tmp_path / "d")) == ["a", "b"]
        assert fsio.list_json_names(f"file://{tmp_path}/d") == ["a", "b"]


class TestManifestOnUri:
    def test_manifest_read_write_list(self, tmp_path):
        from zikeiretsu_rs_spark.catalog.manifest import BlockEntry

        db_dir = f"file://{tmp_path}/wh/default"
        m = Manifest(db_dir, "cpu")
        assert not m.exists() and m.load() == []
        m.add_entry(BlockEntry(0, 10, 5, 5, 99), updated_at_nanos=99)
        assert m.exists() and len(m.load()) == 1
        assert m.updated_at_nanos() == 99
        assert Manifest.list_metrics(db_dir) == ["cpu"]


class TestEmulatedObjectStore:
    """The same metadata-IO paths against pyarrow's in-memory mock
    filesystem registered under a non-file scheme — a true emulated
    bucket (no local-path shortcuts, no os.* fallbacks), covering the
    exists/PUT/list/delete calls an s3://(s3a)/gs:// deployment makes
    (reference cloud metadata IO: cloudstorage/gcp.rs:33-75)."""

    @pytest.fixture()
    def bucket(self):
        from pyarrow.fs import _MockFileSystem

        fsio.register_scheme_filesystem("mock", _MockFileSystem())
        yield "mock://bucket"
        fsio.unregister_scheme_filesystem("mock")

    def test_json_roundtrip_and_list(self, bucket):
        doc = {"k": [1, 2, 3], "s": "x"}
        uri = f"{bucket}/wh/meta/m.json"
        assert not fsio.exists(uri)
        fsio.write_json_atomic(uri, doc)
        assert fsio.exists(uri)
        assert fsio.read_json(uri) == doc
        fsio.write_json_atomic(f"{bucket}/wh/meta/a.json", {})
        assert fsio.list_json_names(f"{bucket}/wh/meta") == ["a", "m"]
        assert fsio.list_json_names(f"{bucket}/wh/absent") == []
        fsio.delete(uri)
        assert not fsio.exists(uri)
        assert fsio.list_json_names(f"{bucket}/wh/meta") == ["a"]

    def test_manifest_on_bucket(self, bucket):
        from zikeiretsu_rs_spark.catalog.manifest import BlockEntry

        db_dir = f"{bucket}/wh/default"
        m = Manifest(db_dir, "cpu")
        assert not m.exists() and m.load() == []
        m.add_entry(BlockEntry(0, 10, 5, 5, 99), updated_at_nanos=99)
        assert m.exists() and len(m.load()) == 1
        assert m.updated_at_nanos() == 99
        assert Manifest.list_metrics(db_dir) == ["cpu"]

    def test_lockfile_cloud_semantics(self, bucket):
        from zikeiretsu_rs_spark.catalog import lockfile

        db_dir = f"{bucket}/wh/default"
        wid = lockfile.new_writer_id()
        with lockfile.metrics_lock(db_dir, "cpu", wid) as path:
            assert fsio.exists(path)
            # a second writer fails fast while held
            with pytest.raises(lockfile.AcquireLockError, match="held by writer"):
                with lockfile.metrics_lock(db_dir, "cpu", lockfile.new_writer_id()):
                    pass
        assert not fsio.exists(lockfile.lockfile_path(db_dir, "cpu"))
        # stale-lock cleanup: same-writer removes, different writer won't
        lockfile._try_create(lockfile.lockfile_path(db_dir, "cpu"), wid)
        lockfile.remove_lock_if_same_writer(db_dir, "cpu", "other-writer")
        assert fsio.exists(lockfile.lockfile_path(db_dir, "cpu"))
        lockfile.remove_lock_if_same_writer(db_dir, "cpu", wid)
        assert not fsio.exists(lockfile.lockfile_path(db_dir, "cpu"))


class TestEngineOnUriWarehouse:
    def test_ingest_query_roundtrip(self, spark, tmp_path):
        from zikeiretsu_rs_spark.engine import Engine

        ctx = DBContext(
            data_dir="/nonexistent-local",  # must never be touched
            default_database="clouddb",
            databases={
                "clouddb": Database("clouddb", cloud_storage=f"file://{tmp_path}/bucket")
            },
        )
        eng = Engine(spark, ctx)
        store = eng.writable_store("trades", [FieldType.FLOAT64])
        store.push_multi(
            [DataPoint.new(1_700_000_000 * NS + i * NS, 1.0 + i) for i in range(10)]
        )
        store.persist()
        # physical layout landed under the bucket path
        assert os.path.isdir(tmp_path / "bucket" / "clouddb" / "block" / "trades")
        assert (
            tmp_path / "bucket" / "clouddb" / "blocklist" / "trades.json"
        ).is_file()
        out = eng.execute_to_df(
            "with cols = [v] select * from trades where ts >= '2023-11-14'"
        )
        assert out.count() == 10
        meta = eng.execute_to_df("select * from .block_list where metrics = trades")
        assert meta.count() == 1

    def test_maintenance_refuses_object_store(self, spark):
        from zikeiretsu_rs_spark.catalog.compact import compact_metrics

        with pytest.raises(NotImplementedError, match="local warehouse"):
            compact_metrics(spark, "s3://bucket/wh/db", "cpu")


class TestDatasetFilesystem:
    """`fsio.dataset_filesystem` — the driver-side resolver pyarrow
    dataset reads (the partitioned-books probe) use so registered
    custom schemes route exactly like the metadata IO does (judged
    ADVICE r10: the probe's direct `pads.dataset(uri)` bypassed the
    registry)."""

    def test_local_path_passthrough(self, tmp_path):
        fs, p = fsio.dataset_filesystem(str(tmp_path / "books"))
        assert fs is None and p == str(tmp_path / "books")

    def test_registered_scheme_resolves_and_reads(self):
        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq
        from pyarrow.fs import _MockFileSystem

        mock = _MockFileSystem()
        fsio.register_scheme_filesystem("mock", mock)
        try:
            fs, p = fsio.dataset_filesystem("mock://bucket/books/cell=3")
            assert fs is mock and p == "bucket/books/cell=3"
            mock.create_dir("bucket/books/cell=3")
            tbl = pa.table({"book": [[1.0, 2.0]]})
            with mock.open_output_stream(
                "bucket/books/cell=3/part-0.parquet"
            ) as out:
                pq.write_table(tbl, out)
            back = pads.dataset(p, format="parquet", filesystem=fs)
            assert back.to_table().num_rows == 1
        finally:
            fsio.unregister_scheme_filesystem("mock")

    def test_unregistered_uri_falls_back_to_pyarrow(self, tmp_path):
        (tmp_path / "d").mkdir()
        fs, p = fsio.dataset_filesystem(f"file://{tmp_path}/d")
        assert fs is not None and p.endswith("/d")
