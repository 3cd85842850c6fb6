"""Round 14: takedown purges run against URI stores (VERDICT r13
"what's missing" #1 — the last 100 TB asymmetry: every maintenance
verb used to funnel through `fsio.as_local`, so an s3a/gs corpus could
be probed and appended but never purged in place).

A file:// store_dir exercises the EXACT pointer-form code path an
object-store deployment takes — fsio routes file:// through
pyarrow.fs, and the backup window is the pointer form
(`catalog/backup.py`): one atomic JSON PUT per state transition, an
immutable versioned copy dir, monotone version numbers. Pinned here:

- ANN: delete -> purge_deleted -> probe on a file:// store is
  row-identical to the SAME corpus purged on a plain local-path store
  (rename form) — the two window forms are behaviorally equivalent;
- the purge is physical and fully closed: dead rows gone from the
  codes parquet, tombstones dropped, pointer "closed", no stranded
  versioned dirs;
- ANN probes serve the pre-rewrite SNAPSHOT through an open pointer
  window (torn-purge crash state included) and recovery converges;
- dedup family (NearDupIndex): forget -> purge_forgotten ->
  add_batch e2e on file://, including verdicts THROUGH a torn
  pointer window bit-identical to the post-recovery replay;
- `maintenance_status()` reports pointer windows.
"""

import os

import pytest
from pyspark.sql import functions as F

from zikeiretsu_rs_spark.catalog import backup as backuplib
from zikeiretsu_rs_spark.catalog import fsio

SF_DIR = "/root/testdata/sf0.001"
M, KSUB, N_CELLS = 8, 8, 4

DOCS_B1 = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "an entirely different document about spark and parquet files"),
    (3, "the quick brown fox jumps over the lazy dog today"),  # ~dup of 1
]
DOCS_B2 = [
    (10, "the quick brown fox jumps over the lazy dog tonight"),  # dup of 1
    (11, "fresh unseen content with no earlier relatives at all"),
    (12, "an entirely different document about spark and parquet files"),
]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _ids(df):
    return {r["neighbor_id"] for r in df.select("neighbor_id").collect()}


def _m(df):
    return sorted(
        (r["doc_id"], r["dup_of"], r["est_jaccard"]) for r in df.collect()
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def cents(emb):
    from zikeiretsu_rs_spark.operators import similarity

    return similarity.head_centroids(emb, N_CELLS, "vec_id", "embedding")


def _build_pq(spark, emb, cents, store_dir):
    from zikeiretsu_rs_spark.operators import similarity

    cb = similarity.pq_codebook(emb, m=M, ksub=KSUB, vec_col="embedding")
    idx = similarity.IvfpqLakeIndex(spark, store_dir)
    idx.build(emb, cents, codebook=cb)
    return idx


class TestAnnPurgeOnUri:
    def test_purge_parity_across_window_forms(
        self, spark, emb, cents, tmp_path
    ):
        """Same corpus, same deletes: a file:// store (pointer-form
        window) and a plain-path store (rename-form window) purge to
        row-identical probe results — and the URI purge leaves a
        fully closed pointer with no as_local anywhere in its path."""
        uri = f"file://{tmp_path}/store_uri"
        idx_u = _build_pq(spark, emb, cents, uri)
        idx_l = _build_pq(spark, emb, cents, str(tmp_path / "store_loc"))
        queries = emb.where(F.col("vec_id") < 6)
        doomed = emb.where(F.col("vec_id") % 7 == 3)
        for idx in (idx_u, idx_l):
            idx.delete(doomed)
            res = idx.purge_deleted()
            assert res["purged_rows"] == doomed.count()
            assert res["dropped_tombstone_batches"] == 1
        cols = ["query_id", "neighbor_id", "adc_cosine", "rank"]
        got_u = _rows(idx_u.probe(queries, k=5, nprobe=N_CELLS).select(*cols))
        got_l = _rows(idx_l.probe(queries, k=5, nprobe=N_CELLS).select(*cols))
        assert got_u == got_l and got_u
        dead = {r["vec_id"] for r in doomed.select("vec_id").collect()}
        assert not (_ids(idx_u.probe(queries, k=5, nprobe=N_CELLS)) & dead)
        # physical on the URI store: rows gone, tombstones dropped
        codes = spark.read.parquet(f"{uri}/codes")
        assert (
            codes.where(F.col("neighbor_id").isin(list(dead))).count() == 0
        )
        assert not fsio.exists(f"{uri}/tombstones")
        # the window is CLOSED the pointer way: closed doc, no __v
        # dirs, and no rename-form root ever existed
        local = str(tmp_path / "store_uri")
        ptr = fsio.read_json(f"{uri}/codes__refresh_backup__ptr.json")
        assert ptr["state"] == "closed"
        assert not [
            d
            for d in os.listdir(local)
            if d.startswith("codes__refresh_backup__v")
        ]
        assert not os.path.isdir(os.path.join(local, "codes__refresh_backup"))
        # converged: a re-run finds nothing to do
        res2 = idx_u.purge_deleted()
        assert res2["purged_rows"] == 0

    def test_probe_serves_snapshot_through_pointer_window(
        self, spark, emb, cents, tmp_path
    ):
        """The round-12 availability guarantee through the POINTER
        window: a torn purge (window open, a live partition already
        gone) still probes bit-identical to pre-rewrite, and the next
        maintenance verb rolls it back."""
        uri = f"file://{tmp_path}/store"
        idx = _build_pq(spark, emb, cents, uri)
        queries = emb.where(F.col("vec_id") < 6)
        before = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        codes = f"{uri}/codes"
        cells = fsio.list_dir_names(f"{codes}/epoch=0", "cell=")
        victim = int(cells[0].split("=", 1)[1])
        # hand-build the torn-purge crash state, pointer-form: window
        # open over one cell, its live dir already rewritten away
        backuplib.create(
            codes,
            codes + "__refresh_backup",
            [f"epoch=0/cell={victim}"],
            meta={"verb": "purge_deleted"},
        )
        fsio.delete_dir(f"{codes}/epoch=0/cell={victim}")
        src = backuplib.snapshot_source(codes + "__refresh_backup")
        assert src == codes + "__refresh_backup__v1"
        mid = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        assert mid == before  # bit-identical snapshot service
        # status reports the open pointer window
        st = idx.maintenance_status()
        assert st["window"]["state"] == "open"
        assert st["window"]["replaced_partitions"] == 1
        assert st["window"]["meta"]["verb"] == "purge_deleted"
        # the next verb recovers (no tombstones -> pure rollback)
        idx.purge_deleted()
        assert backuplib.snapshot_source(codes + "__refresh_backup") is None
        assert _rows(idx.probe(queries, k=5, nprobe=N_CELLS)) == before

    def test_full_takedown_on_uri(self, spark, emb, cents, tmp_path):
        """Delete EVERYTHING, purge on file://: fully-dead cell dirs
        and epoch dirs go, the codes root drops to the documented
        zero-epoch empty state — all through fsio, no renames."""
        uri = f"file://{tmp_path}/store"
        idx = _build_pq(spark, emb, cents, uri)
        idx.delete(emb)
        res = idx.purge_deleted()
        assert res["purged_rows"] == emb.count()
        assert not fsio.exists(f"{uri}/codes")
        assert idx._epochs() == []


class TestDedupPurgeOnUri:
    def test_forget_purge_add_batch_e2e(self, spark, tmp_path):
        from zikeiretsu_rs_spark.streaming.neardup import NearDupIndex

        uri = f"file://{tmp_path}/nd"
        idx = NearDupIndex(spark, uri, threshold=0.5)
        idx.add_batch(_docs(spark, DOCS_B1), epoch=0)
        ledger_before = _m(idx.matches())
        idx.forget(spark.createDataFrame([(2,)], "doc_id long"))
        res = idx.purge_forgotten()
        assert res["purged_rows"] > 0
        assert res["dropped_tombstone_batches"] == 1
        assert not fsio.exists(f"{uri}/tombstones")
        # pointer closed, no stranded versions, no rename root
        ptr = fsio.read_json(f"{uri}/__forget_backup__ptr.json")
        assert ptr["state"] == "closed"
        local = str(tmp_path / "nd")
        assert not [
            d for d in os.listdir(local) if d.startswith("__forget_backup__v")
        ]
        assert not os.path.isdir(os.path.join(local, "__forget_backup"))
        # the matches ledger is history — untouched by purge
        assert _m(idx.matches()) == ledger_before
        # next batch: 10 matches 1 and 3; 12's only relative (doc 2)
        # is physically gone
        idx.add_batch(_docs(spark, DOCS_B2), epoch=1)
        mid = _m(spark.read.parquet(f"{uri}/matches/epoch=1"))
        assert {(d, o) for d, o, _ in mid} == {(10, 1), (10, 3)}

    def test_verdicts_through_torn_pointer_window(self, spark, tmp_path):
        """add_batch indexes THROUGH a torn pointer-form purge window
        (round 13's `_snapshot_history_read` union, now over the
        versioned source): mid-window verdicts are bit-identical to
        the post-recovery replay of the same epoch."""
        from zikeiretsu_rs_spark.streaming.neardup import NearDupIndex

        uri = f"file://{tmp_path}/nd"
        idx = NearDupIndex(spark, uri, threshold=0.5)
        idx.add_batch(_docs(spark, DOCS_B1), epoch=0)
        idx.forget(spark.createDataFrame([(2,)], "doc_id long"))
        # hand-build the torn purge: window open over buckets epoch 0
        # (pointer form), live dir already rewritten away
        backuplib.create(
            uri,
            fsio.join(uri, "__forget_backup"),
            ["buckets/epoch=0"],
            meta={"verb": "purge_forgotten"},
        )
        fsio.delete_dir(f"{uri}/buckets/epoch=0")
        # mid-window verdicts: snapshot buckets filtered by the live
        # tombstones — 10 matches 1 and 3, 12 matches nothing
        idx.add_batch(_docs(spark, DOCS_B2), epoch=1)
        mid = _m(spark.read.parquet(f"{uri}/matches/epoch=1"))
        assert {(d, o) for d, o, _ in mid} == {(10, 1), (10, 3)}
        # recovery + purge converge; the same epoch replays identically
        res = idx.purge_forgotten()
        assert res["purged_rows"] > 0
        idx.add_batch(_docs(spark, DOCS_B2), epoch=1)
        assert _m(spark.read.parquet(f"{uri}/matches/epoch=1")) == mid

    def test_semantic_purge_on_uri(self, spark, tmp_path):
        """The (epoch, cell)-partitioned dedup index purges on
        file:// too — covers the cell-granular rewrite + the
        cell-dir removal path through fsio."""
        import numpy as np

        from zikeiretsu_rs_spark.streaming.neardup import (
            SemanticDedupIndex,
        )

        rng = np.random.default_rng(3)
        base = rng.normal(size=(4, 8))
        rows = [
            (i, [float(x) for x in base[i % 4] + rng.normal(scale=0.01, size=8)])
            for i in range(24)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        uri = f"file://{tmp_path}/sd"
        idx = SemanticDedupIndex(spark, uri, threshold=0.95)
        idx.build(
            emb.where(F.col("vec_id") < 12),
            [[float(x) for x in c] for c in base],
        )
        idx.forget(spark.createDataFrame([(0,), (1,)], "vec_id long"))
        res = idx.purge_forgotten()
        assert res["purged_rows"] == 2
        assert not fsio.exists(f"{uri}/tombstones")
        cells = spark.read.schema(
            "vec_id long, vec array<double>, norm double, epoch int, cell int"
        ).option("basePath", f"{uri}/cells").parquet(f"{uri}/cells")
        assert cells.where(F.col("vec_id").isin([0, 1])).count() == 0


class TestRefreshOnUri:
    """Round 14 extension of the pointer-form window to
    `refresh_books` — every step was already fsio/Spark-native, so a
    drifted percell store at a file:// URI refreshes through the
    pointer window exactly like a local store through the rename one;
    `compact` is now the ONLY local-only maintenance verb (its
    epoch-merge swap genuinely needs renames)."""

    @pytest.fixture(scope="class")
    def split(self, spark, emb, cents):
        from zikeiretsu_rs_spark.operators import similarity

        asg = similarity.assign_cells_arrow(
            emb, cents, "vec_id", "embedding", metric="dot"
        ).select("vec_id", "cell")
        counts = {
            int(r["cell"]): int(r["n"])
            for r in asg.groupBy("cell").agg(F.count("*").alias("n")).collect()
        }
        victim = max(counts, key=lambda c: counts[c])
        seed = emb.join(
            asg.where(F.col("cell") != victim).select("vec_id"), "vec_id"
        ).cache()
        batch = emb.join(
            asg.where(F.col("cell") == victim).select("vec_id"), "vec_id"
        ).cache()
        return victim, seed, batch

    def _build_drifted(self, spark, cents, split, store):
        from zikeiretsu_rs_spark.operators import similarity

        victim, seed, batch = split
        books_df = similarity.pq_codebook_residual_percell_df(
            seed, cents, m=M, ksub=KSUB
        )
        idx = similarity.IvfpqLakeIndex(spark, store)
        idx.build(seed, cents, books_df=books_df, m=M, ksub=KSUB)
        idx.add_batch(batch)
        return idx

    def test_refresh_parity_across_window_forms(
        self, spark, emb, cents, split, tmp_path
    ):
        """The same drifted store refreshed at a file:// URI (pointer
        window) and at a plain path (rename window): identical
        refreshed-cell sets, identical manifests, row-identical
        post-refresh probes, and the URI window closed the pointer
        way."""
        victim, seed, batch = split
        uri = f"file://{tmp_path}/ru"
        idx_u = self._build_drifted(spark, cents, split, uri)
        idx_l = self._build_drifted(
            spark, cents, split, str(tmp_path / "rl")
        )
        queries = emb.where(F.col("vec_id") < 6)
        got = {}
        for key, idx in (("uri", idx_u), ("loc", idx_l)):
            res = idx.refresh_books(emb)
            assert res["refreshed_cells"] == [victim]
            assert res["rows_reencoded"] == batch.count()
            got[key] = _rows(
                idx.probe(queries, k=5, nprobe=N_CELLS).select(
                    "query_id", "neighbor_id", "adc_cosine", "rank"
                )
            )
        assert got["uri"] == got["loc"] and got["uri"]
        man = fsio.read_json(f"{uri}/books_manifest.json")
        assert victim in set(man["cells"])
        ptr = fsio.read_json(f"{uri}/codes__refresh_backup__ptr.json")
        assert ptr["state"] == "closed"
        local = str(tmp_path / "ru")
        assert not [
            d
            for d in os.listdir(local)
            if d.startswith("codes__refresh_backup__v")
        ]

    def test_torn_uri_refresh_rolls_back_and_converges(
        self, spark, emb, cents, split, tmp_path
    ):
        """The r13 HIGH scenario, pointer-form: a refresh that
        crashed after writing the new books but before the manifest
        extension (window open, live codes partition gone, donor-book
        debris on disk). The mid-window probe must serve the
        pre-rewrite snapshot bit-identically; the re-run must roll
        back and converge to the same refreshed state as a clean
        run."""
        victim, seed, batch = split
        uri = f"file://{tmp_path}/rt"
        idx = self._build_drifted(spark, cents, split, uri)
        queries = emb.where(F.col("vec_id") < 6)
        pre = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        codes = f"{uri}/codes"
        eps = idx._epochs()
        # the window opens with the refresh's own meta (pre-rewrite
        # fitted set + drifted set), pointer-form
        man = fsio.read_json(f"{uri}/books_manifest.json")
        backuplib.create(
            codes,
            codes + "__refresh_backup",
            [f"epoch={ep}/cell={victim}" for ep in eps],
            meta={
                "verb": "refresh_books",
                "fitted_cells": sorted(man["cells"]),
                "drifted": [victim],
            },
        )
        # the torn job commit: live drifted partitions gone; the NEW
        # book landed (a DIFFERENT fitted cell's book as donor — a
        # wrongful read diverges loudly)
        for ep in eps:
            fsio.delete_dir(f"{codes}/epoch={ep}/cell={victim}")
        donor = sorted(man["cells"])[0]
        fsio.copy_dir(
            f"{uri}/books/cell={donor}", f"{uri}/books/cell={victim}"
        )
        mid = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        assert mid == pre  # bit-identical snapshot through the window
        # the re-run rolls back (manifest lacks the drifted cell) and
        # converges to the clean refresh
        res = idx.refresh_books(emb)
        assert res["refreshed_cells"] == [victim]
        assert res["rows_reencoded"] == batch.count()
        assert (
            backuplib.snapshot_source(codes + "__refresh_backup") is None
        )
        post = idx.probe(queries, k=5, nprobe=N_CELLS)
        assert len(_rows(post)) == len(pre)
        # the twin clean-run store probes identically
        idx2 = self._build_drifted(
            spark, cents, split, str(tmp_path / "rc")
        )
        idx2.refresh_books(emb)
        assert _rows(
            post.select("query_id", "neighbor_id", "adc_cosine", "rank")
        ) == _rows(
            idx2.probe(queries, k=5, nprobe=N_CELLS).select(
                "query_id", "neighbor_id", "adc_cosine", "rank"
            )
        )


class TestPointerWindowOnPureUriScheme:
    """The pointer-form window machinery on a PURE object-store URI —
    a scheme with NO local-path translation at all (`fsio.local_or_none`
    returns None), routed through `fsio.register_scheme_filesystem`
    exactly like a deployment would route a custom store. file:// is
    the e2e vehicle elsewhere in this file because Spark can read it;
    THIS class pins that the window machinery itself (create /
    snapshot_source / leaf_rels / read_meta_at / recover / drop /
    window_state / has_close_debris) never falls back to an os.* code
    path — any hidden local-API dependency would fail loudly on the
    mock:// paths."""

    @pytest.fixture()
    def mock_fs(self, tmp_path):
        from pyarrow import fs as pafs

        fsio.register_scheme_filesystem(
            "mock",
            pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem()),
        )
        yield str(tmp_path)
        fsio.unregister_scheme_filesystem("mock")

    def _seed(self, base, rel, doc):
        fsio.write_json_atomic(fsio.join(base, rel, "part-0.json"), doc)

    def test_full_window_lifecycle(self, mock_fs):
        base = "mock://store/codes"
        root = base + "__refresh_backup"
        assert fsio.local_or_none(base) is None  # pure URI, no fallback
        self._seed(base, "epoch=0/cell=0", {"v": "live0"})
        self._seed(base, "epoch=0/cell=1", {"v": "live1"})
        # open
        backuplib.create(
            base, root, ["epoch=0/cell=0"], meta={"verb": "purge_deleted"}
        )
        src = backuplib.snapshot_source(root)
        assert src == root + "__v1"
        assert backuplib.leaf_rels(src) == ["epoch=0/cell=0"]
        assert backuplib.read_meta_at(src)["verb"] == "purge_deleted"
        assert backuplib.window_state(root) == ("open", src)
        assert backuplib.exists(root)
        # the rewrite mutates live; recover restores the copy
        self._seed(base, "epoch=0/cell=0", {"v": "REWRITTEN"})
        assert backuplib.recover(base, root) is True
        assert (
            fsio.read_json(f"{base}/epoch=0/cell=0/part-0.json")["v"]
            == "live0"
        )
        assert backuplib.snapshot_source(root) is None
        assert not backuplib.has_close_debris(root)
        # versions are monotone: the next window is __v2, never __v1
        backuplib.create(base, root, ["epoch=0/cell=1"])
        assert backuplib.snapshot_source(root) == root + "__v2"
        backuplib.drop(root)
        assert backuplib.snapshot_source(root) is None
        ptr = fsio.read_json(root + "__ptr.json")
        assert ptr == {"state": "closed", "version": 2}

    def test_crash_matrix_on_pure_uri(self, mock_fs):
        base = "mock://store/codes"
        root = base + "__forget" 
        self._seed(base, "epoch=0", {"v": "live"})
        # crash BEFORE the open-PUT: stranded unreferenced __v dir is
        # debris (the __tmp rule) — never a source, swept by recover
        fsio.write_json_atomic(
            fsio.join(root + "__v7", "epoch=0", "part-0.json"), {"v": "x"}
        )
        assert backuplib.snapshot_source(root) is None
        assert backuplib.has_close_debris(root)
        assert backuplib.recover(base, root) is False
        assert not fsio.exists(fsio.join(root + "__v7", "epoch=0"))
        # crash MID-RESTORE: "restoring" pointer resumes idempotently
        backuplib.create(base, root, ["epoch=0"])
        fsio.write_json_atomic(
            root + "__ptr.json", {"state": "restoring", "version": 1}
        )
        self._seed(base, "epoch=0", {"v": "torn"})
        src = backuplib.snapshot_source(root)
        assert src == root + "__v1"  # still a valid source mid-restore
        assert backuplib.window_state(root)[0] == "restoring"
        assert backuplib.recover(base, root) is True
        assert (
            fsio.read_json(f"{base}/epoch=0/part-0.json")["v"] == "live"
        )
        # drop never closes a mid-restore window (recover's job)
        backuplib.create(base, root, ["epoch=0"])
        fsio.write_json_atomic(
            root + "__ptr.json", {"state": "restoring", "version": 2}
        )
        backuplib.drop(root)
        assert backuplib.window_state(root)[0] == "restoring"
        assert fsio.exists(
            fsio.join(root + "__v2", "__snapshot_rels.json")
        )
        backuplib.recover(base, root)

    def test_create_refuses_mid_restore_pointer(self, mock_fs):
        base = "mock://store/codes"
        root = base + "__bk"
        self._seed(base, "epoch=0", {"v": "live"})
        backuplib.create(base, root, ["epoch=0"])
        fsio.write_json_atomic(
            root + "__ptr.json", {"state": "restoring", "version": 1}
        )
        with pytest.raises(RuntimeError, match="recover"):
            backuplib.create(base, root, ["epoch=0"])

