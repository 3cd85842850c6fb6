"""Lake-index deletes (round 11 — the remaining lifecycle gap:
build/append/refresh/compact existed, remove did not, and a 100 TB
training-data index must honor takedowns without a rebuild).

`IvfpqLakeIndex.delete(ids)` writes log-structured tombstones
(`tombstones/batch=M/`, rows of (neighbor_id, epoch_cut = max epoch at
delete time)); a tombstone kills the id's code rows in every epoch <=
its epoch_cut, and `add_batch` always lands in a strictly higher
epoch, so a later re-add resurrects the id. Probes anti-join the live
view (`_live_codes`); `purge_deleted` (standalone, and first inside
`compact` — BEFORE the epoch merge renumbers rows) physically drops
dead rows and spent tombstones under the refresh rewrite's
backup/rollback discipline.

Invariants pinned here:

- a deleted id disappears from probe (and probe_refined) results, and
  the probe is row-identical to the in-memory collect path over the
  LIVE corpus — deletes are invisible to ranking, visible only as
  absence;
- re-adding a deleted id resurrects it; deleting again (a later
  epoch_cut) kills it again;
- delete replays idempotently (explicit batch overwrite) and is a
  no-op on a store with no epochs;
- purge is physical (dead ids gone from the codes parquet, fully-dead
  partitions removed, tombstone tree dropped) and probe-invisible:
  results before and after purge are identical rows;
- purge re-runs converge; while a purge rewrite's backup survives
  (healthy in-flight or torn) probe serves the pre-rewrite SNAPSHOT
  (backup ∪ untouched partitions — bit-identical results, round 12)
  and the next purge rolls back, converging to the same final state;
- compact purges BEFORE the merge, so epoch renumbering never meets a
  live tombstone and deleted rows cannot resurrect through
  compaction;
- refresh_books works on the live view: a corpus that no longer holds
  the DELETED drifted rows' floats still passes its coverage check,
  and the refresh does not resurrect them.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
M, KSUB, N_CELLS = 8, 8, 4


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _ids(df):
    return {r["neighbor_id"] for r in df.select("neighbor_id").collect()}


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def cents(emb):
    from zikeiretsu_rs_spark.operators import similarity

    return similarity.head_centroids(emb, N_CELLS, "vec_id", "embedding")


def _build_percell(spark, emb, cents, tmp_path, corpus=None):
    """Partitioned-books percell store over the full corpus (the
    headline encoding) — deletes are encoding-agnostic, but the
    percell path exercises tombstones alongside books/manifest."""
    from zikeiretsu_rs_spark.operators import similarity

    corpus = emb if corpus is None else corpus
    books_df = similarity.pq_codebook_residual_percell_df(
        corpus, cents, m=M, ksub=KSUB
    )
    p = str(tmp_path / "store")
    idx = similarity.IvfpqLakeIndex(spark, p)
    idx.build(corpus, cents, books_df=books_df, m=M, ksub=KSUB)
    return idx, p


def _build_pq(spark, emb, cents, tmp_path):
    from zikeiretsu_rs_spark.operators import similarity

    cb = similarity.pq_codebook(emb, m=M, ksub=KSUB, vec_col="embedding")
    p = str(tmp_path / "store_pq")
    idx = similarity.IvfpqLakeIndex(spark, p)
    idx.build(emb, cents, codebook=cb)
    return idx, p


class TestDeleteSemantics:
    def test_deleted_ids_leave_probe_and_parity_with_live_corpus(
        self, spark, emb, cents, tmp_path
    ):
        from zikeiretsu_rs_spark.operators import similarity

        idx, p = _build_percell(spark, emb, cents, tmp_path)
        queries = emb.where(F.col("vec_id") < 6)
        doomed = emb.where(F.col("vec_id") % 7 == 3)
        res = idx.delete(doomed)
        assert res["tombstoned_ids"] == doomed.count()
        assert res["epoch_cut"] == 0 and res["batch"] == 0
        lake = idx.probe(queries, k=5, nprobe=N_CELLS)
        dead = {r["vec_id"] for r in doomed.select("vec_id").collect()}
        assert not (_ids(lake) & dead)
        # parity: probe over the tombstoned store == in-memory collect
        # path over the live corpus (books read back from the lake)
        live = emb.where(F.col("vec_id") % 7 != 3)
        books = similarity.load_percell_books(spark, p)
        mem = similarity.ivfadc_percell_topk(
            live, queries, books, k=5, nprobe=N_CELLS, centroids=cents
        )
        cols = ["query_id", "neighbor_id", "adc_cosine", "rank"]
        assert _rows(lake.select(*cols)) == _rows(mem.select(*cols))

    def test_probe_refined_excludes_deleted(
        self, spark, emb, cents, tmp_path
    ):
        idx, p = _build_percell(spark, emb, cents, tmp_path)
        queries = emb.where(F.col("vec_id") < 4)
        doomed = emb.where(F.col("vec_id") % 5 == 2)
        idx.delete(doomed)
        # corpus for the float rescore still HOLDS the deleted rows —
        # the candidate set already excludes them, so refinement
        # cannot re-introduce a deleted id
        ref = idx.probe_refined(queries, emb, k=5, expand=2, nprobe=N_CELLS)
        dead = {r["vec_id"] for r in doomed.select("vec_id").collect()}
        assert not (_ids(ref) & dead)

    def test_readd_resurrects_then_second_delete_kills(
        self, spark, emb, cents, tmp_path
    ):
        idx, p = _build_percell(spark, emb, cents, tmp_path)
        queries = emb.where(F.col("vec_id") < 6)
        base = _ids(idx.probe(queries, k=5, nprobe=N_CELLS))
        victim = sorted(base)[0]
        one = emb.where(F.col("vec_id") == victim)
        idx.delete(one)
        assert victim not in _ids(idx.probe(queries, k=5, nprobe=N_CELLS))
        idx.add_batch(one)  # epoch 1 > epoch_cut 0 -> resurrect
        assert victim in _ids(idx.probe(queries, k=5, nprobe=N_CELLS))
        res2 = idx.delete(one)
        assert res2["epoch_cut"] == 1  # the cut tracks the epoch log
        assert victim not in _ids(idx.probe(queries, k=5, nprobe=N_CELLS))

    def test_delete_replay_idempotent(self, spark, emb, cents, tmp_path):
        idx, p = _build_percell(spark, emb, cents, tmp_path)
        doomed = emb.where(F.col("vec_id") % 11 == 1)
        r1 = idx.delete(doomed, batch=0)
        tomb1 = _rows(spark.read.parquet(f"{p}/tombstones"))
        r2 = idx.delete(doomed, batch=0)  # redelivery: same batch id
        assert (r1, _rows(spark.read.parquet(f"{p}/tombstones"))) == (
            r2,
            tomb1,
        )

    def test_delete_on_zero_epoch_store_is_noop(
        self, spark, emb, cents, tmp_path
    ):
        """A store whose model froze but whose epoch 0 never landed
        (the documented build crash window) has nothing to kill and
        no epoch to cut at — delete is a recorded no-op."""
        import shutil

        idx, p = _build_pq(spark, emb, cents, tmp_path)
        shutil.rmtree(os.path.join(p, "codes"), ignore_errors=True)
        res = idx.delete(emb.where(F.col("vec_id") == 1))
        assert res == {"tombstoned_ids": 0, "epoch_cut": None, "batch": None}
        assert not os.path.isdir(os.path.join(p, "tombstones"))

    def test_tombstone_of_unindexed_id_harmless_and_swept(
        self, spark, emb, cents, tmp_path
    ):
        idx, p = _build_percell(spark, emb, cents, tmp_path)
        ghost = spark.createDataFrame([(10**9,)], "vec_id long")
        idx.delete(ghost)
        queries = emb.where(F.col("vec_id") < 6)
        before = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        res = idx.purge_deleted()
        assert res["purged_rows"] == 0
        assert res["dropped_tombstone_batches"] == 1
        assert not os.path.isdir(os.path.join(p, "tombstones"))
        assert _rows(idx.probe(queries, k=5, nprobe=N_CELLS)) == before


class TestPurge:
    def test_purge_is_physical_and_probe_invisible(
        self, spark, emb, cents, tmp_path
    ):
        idx, p = _build_percell(spark, emb, cents, tmp_path)
        queries = emb.where(F.col("vec_id") < 6)
        doomed = emb.where(F.col("vec_id") % 7 == 3)
        idx.delete(doomed)
        before = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        res = idx.purge_deleted()
        assert res["purged_rows"] == doomed.count()
        assert res["dropped_tombstone_batches"] == 1
        assert not os.path.isdir(os.path.join(p, "tombstones"))
        dead = {r["vec_id"] for r in doomed.select("vec_id").collect()}
        codes = spark.read.parquet(f"{p}/codes")
        assert codes.where(F.col("neighbor_id").isin(list(dead))).count() == 0
        assert _rows(idx.probe(queries, k=5, nprobe=N_CELLS)) == before
        # converged: a re-run finds nothing to do
        res2 = idx.purge_deleted()
        assert res2["purged_rows"] == 0
        assert res2["dropped_tombstone_batches"] == 0

    def test_fully_dead_partition_directory_removed(
        self, spark, emb, cents, tmp_path
    ):
        """Dynamic partition overwrite only replaces partitions present
        in the written data — a partition whose every row died writes
        nothing and must be removed explicitly (the purge's
        empty-partition branch)."""
        idx, p = _build_percell(spark, emb, cents, tmp_path)
        codes = spark.read.parquet(f"{p}/codes")
        some_cell = int(codes.select("cell").head(1)[0]["cell"])
        # materialize before the purge deletes the source files the
        # lazy plan would re-read
        dead = {
            int(r["neighbor_id"])
            for r in codes.where(F.col("cell") == some_cell)
            .select("neighbor_id")
            .collect()
        }
        cell_ids = spark.createDataFrame(
            [(i,) for i in sorted(dead)], "vec_id long"
        )
        idx.delete(cell_ids)
        res = idx.purge_deleted()
        assert res["removed_partitions"] >= 1
        assert not os.path.isdir(
            os.path.join(p, "codes", "epoch=0", f"cell={some_cell}")
        )
        # the store still probes (the emptied cell just has no rows)
        queries = emb.where(F.col("vec_id") < 4)
        alive = _ids(idx.probe(queries, k=5, nprobe=N_CELLS))
        assert not (alive & dead)

    def test_torn_purge_rewrite_probe_serves_snapshot_then_recovers(
        self, spark, emb, cents, tmp_path
    ):
        """A surviving codes__refresh_backup (crash inside the
        partition rewrite's job commit, or a HEALTHY rewrite still in
        flight) no longer makes probe refuse (round 12): the backup
        is by construction a complete pre-rewrite truth for the
        replaced partitions, so probe serves the snapshot — backup ∪
        untouched live partitions — and returns BIT-IDENTICAL
        pre-rewrite results even while rows are physically missing
        from the live tree. The next purge still rolls back and
        converges to the same final state."""
        import shutil

        idx, p = _build_percell(spark, emb, cents, tmp_path)
        queries = emb.where(F.col("vec_id") < 6)
        doomed = emb.where(F.col("vec_id") % 7 == 3)
        idx.delete(doomed)
        want = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        # simulate the torn window: back up one live partition, then
        # delete it from the lake (the rewrite died mid-commit)
        codes = os.path.join(p, "codes")
        cell_dirs = sorted(
            d
            for d in os.listdir(os.path.join(codes, "epoch=0"))
            if d.startswith("cell=")
        )
        victim_dir = cell_dirs[0]
        backup = codes + "__refresh_backup"
        os.makedirs(os.path.join(backup, "epoch=0"))
        shutil.copytree(
            os.path.join(codes, "epoch=0", victim_dir),
            os.path.join(backup, "epoch=0", victim_dir),
        )
        shutil.rmtree(os.path.join(codes, "epoch=0", victim_dir))
        # mid-rewrite: the snapshot read is bit-identical pre-rewrite
        assert _rows(idx.probe(queries, k=5, nprobe=N_CELLS)) == want
        res = idx.purge_deleted()  # rolls back, then applies tombstones
        assert res["purged_rows"] == doomed.count()
        assert _rows(idx.probe(queries, k=5, nprobe=N_CELLS)) == want


    def test_probe_snapshot_when_every_partition_replaced(
        self, spark, emb, cents, tmp_path
    ):
        """Worst-case maintenance window: a rewrite that replaces
        EVERY live partition (e.g. a full-corpus refresh) mid-flight
        with the live tree already gone. The snapshot is the backup
        alone — probe (and the refined two-stage probe through it)
        must return bit-identical pre-rewrite results, not refuse and
        not probe empty."""
        import shutil

        idx, p = _build_pq(spark, emb, cents, tmp_path)
        queries = emb.where(F.col("vec_id") < 6)
        want = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        want_refined = _rows(
            idx.probe_refined(queries, emb, k=5, nprobe=N_CELLS)
        )
        codes = os.path.join(p, "codes")
        shutil.copytree(codes, codes + "__refresh_backup")
        shutil.rmtree(codes)  # the rewrite deleted everything live
        assert _rows(idx.probe(queries, k=5, nprobe=N_CELLS)) == want
        assert (
            _rows(idx.probe_refined(queries, emb, k=5, nprobe=N_CELLS))
            == want_refined
        )


class TestLifecycleEdges:
    """The judged-review pass over the first delete cut: lifecycle
    interactions between tombstones and rebuild / torn writes / torn
    compaction swaps / full takedown / epoch-number reuse."""

    def test_rebuild_clears_stale_tombstones(
        self, spark, emb, cents, tmp_path
    ):
        """Tombstones are statements about the OLD store's epochs: a
        rebuild restarts at epoch 0, so a surviving (id, cut) would
        silently kill the rebuild corpus's rows."""
        from zikeiretsu_rs_spark.operators import similarity

        idx, p = _build_pq(spark, emb, cents, tmp_path)
        doomed = emb.where(F.col("vec_id") % 7 == 3)
        idx.delete(doomed)
        cb = similarity.pq_codebook(emb, m=M, ksub=KSUB, vec_col="embedding")
        idx.build(emb, cents, codebook=cb)  # rebuild in place
        assert not os.path.isdir(os.path.join(p, "tombstones"))
        queries = emb.where(F.col("vec_id") < 6)
        dead = {r["vec_id"] for r in doomed.select("vec_id").collect()}
        # the rebuilt index must surface previously-deleted ids again
        assert _ids(idx.probe(queries, k=50, nprobe=N_CELLS)) & dead

    def test_torn_delete_write_is_inert_and_swept(
        self, spark, emb, cents, tmp_path
    ):
        """A delete() that died inside its tombstone batch write
        leaves only a _temporary dir — the schema-pinned tombstone
        read sees zero tombstones (probe/refresh/purge keep working)
        and the next purge sweeps the debris."""
        idx, p = _build_pq(spark, emb, cents, tmp_path)
        os.makedirs(os.path.join(p, "tombstones", "batch=0", "_temporary"))
        queries = emb.where(F.col("vec_id") < 6)
        full = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        assert full  # probe neither crashes nor filters anything
        res = idx.purge_deleted()
        assert res["purged_rows"] == 0
        assert not os.path.isdir(os.path.join(p, "tombstones"))
        assert _rows(idx.probe(queries, k=5, nprobe=N_CELLS)) == full

    def test_full_takedown_probes_empty(self, spark, emb, cents, tmp_path):
        """Deleting every indexed id then purging must converge to
        the documented zero-epoch empty store, not a fileless tree
        that fails schema inference on the next read."""
        idx, p = _build_pq(spark, emb, cents, tmp_path)
        idx.delete(emb)
        res = idx.purge_deleted()
        assert res["rewritten_partitions"] == 0
        assert res["removed_partitions"] > 0
        assert not os.path.isdir(os.path.join(p, "codes"))
        queries = emb.where(F.col("vec_id") < 6)
        out = idx.probe(queries, k=5, nprobe=N_CELLS)
        assert out.count() == 0  # empty result, correct schema
        assert out.columns == ["query_id", "neighbor_id", "adc_cosine", "rank"]

    def test_purge_recovers_torn_compaction_swap_first(
        self, spark, emb, cents, tmp_path
    ):
        """A compaction swap that died between its two renames leaves
        `_old_epoch=N` and no live `epoch=N` (Spark discovery skips
        _-prefixed dirs). Purge must roll that forward BEFORE
        computing the dead set — otherwise tombstones whose rows hide
        in the stranded epoch are dropped unapplied and the rows
        resurrect at the next compact."""
        idx, p = _build_pq(spark, emb, cents, tmp_path)
        codes = os.path.join(p, "codes")
        doomed = emb.where(F.col("vec_id") % 7 == 3)
        res0 = idx.delete(doomed)
        assert res0["tombstoned_ids"] > 0
        # crash simulation: the swap died between its two renames —
        # the epoch is stranded under the _-prefixed name
        os.rename(
            os.path.join(codes, "epoch=0"),
            os.path.join(codes, "_old_epoch=0"),
        )
        res = idx.purge_deleted()
        assert res["purged_rows"] == doomed.count()
        assert os.path.isdir(os.path.join(codes, "epoch=0"))  # rolled forward
        dead = {r["vec_id"] for r in doomed.select("vec_id").collect()}
        lake = spark.read.parquet(codes)
        assert lake.where(F.col("neighbor_id").isin(list(dead))).count() == 0

    def test_purge_never_regresses_epoch_numbering(
        self, spark, emb, cents, tmp_path
    ):
        """A purge can legitimately sweep the NEWEST epoch directory
        (fully-dead — e.g. a CDC batch deleted that epoch's rows) and
        then drops every tombstone cut. The high water must NOT
        regress below epochs already issued to a running stream
        (judged ADVICE r11, medium): the next contiguous foreachBatch
        delivery — and every replay of it — must still pass upsert's
        gap check and delete's cut validation, via the epoch floor
        purge pins before anything destructive."""
        seed = emb.where(F.col("vec_id") % 2 == 0)
        batch = emb.where(F.col("vec_id") % 2 == 1)
        idx, p = _build_pq_over(spark, seed, cents, tmp_path)
        idx.add_batch(batch)  # epoch 1
        idx.delete(batch)  # cut = 1: epoch 1 is now fully dead
        res = idx.purge_deleted()
        assert res["purged_rows"] > 0
        assert not os.path.isdir(os.path.join(p, "codes", "epoch=1"))
        assert not os.path.isdir(os.path.join(p, "tombstones"))
        # the stream's next delivery is epoch 2 — NOT a gap, and its
        # replay (delete cut=1, batch=-2) must validate identically
        idx.upsert_batch(batch, epoch=2)
        idx.upsert_batch(batch, epoch=2)  # foreachBatch redelivery
        eps = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(os.path.join(p, "codes"))
            if d.startswith("epoch=")
        )
        assert eps == [0, 2]  # never re-numbered under the old cut
        queries = emb.where(F.col("vec_id") < 6)
        readded = {r["vec_id"] for r in batch.select("vec_id").collect()}
        assert _ids(idx.probe(queries, k=50, nprobe=N_CELLS)) & readded

    def test_delete_rejects_lossy_id_cast(self, spark, emb, cents, tmp_path):
        """IvfpqLakeIndex.delete has no _require_integral_id wrapper —
        the shared tombstone write itself must refuse an id column
        that would NULL out or truncate under the cast to the store's
        id type (judged ADVICE r11, low), instead of reporting a
        successful takedown of the wrong ids."""
        import pyspark.sql.functions as SF

        idx, _p = _build_pq(spark, emb, cents, tmp_path)
        with pytest.raises(TypeError, match="losslessly"):
            idx.delete(
                emb.select(
                    (SF.col("vec_id") + SF.lit(0.5)).alias("vec_id")
                )
            )

    def test_add_batch_never_reuses_epoch_under_live_cut(
        self, spark, emb, cents, tmp_path
    ):
        """Epoch numbering high-waters above surviving tombstone
        cuts: simulate the crash window where a purge removed a
        fully-dead epoch directory but died before dropping the
        tombstones — the next add_batch must NOT reuse the removed
        epoch number (a surviving cut kills epochs <= cut)."""
        import shutil

        seed = emb.where(F.col("vec_id") % 2 == 0)
        batch = emb.where(F.col("vec_id") % 2 == 1)
        idx, p = _build_pq_over(spark, seed, cents, tmp_path)
        idx.add_batch(batch)  # epoch 1
        idx.delete(batch)  # cut = 1
        # crash simulation: epoch 1 physically gone, tombstones alive
        shutil.rmtree(os.path.join(p, "codes", "epoch=1"))
        idx.add_batch(batch)  # would be epoch 1 again without the guard
        eps = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(os.path.join(p, "codes"))
            if d.startswith("epoch=")
        )
        assert eps == [0, 2]  # high-watered past the live cut
        queries = emb.where(F.col("vec_id") < 6)
        alive = _ids(idx.probe(queries, k=50, nprobe=N_CELLS))
        readded = {r["vec_id"] for r in batch.select("vec_id").collect()}
        assert alive & readded  # the re-add survived the old cut


def _build_pq_over(spark, corpus, cents, tmp_path):
    from zikeiretsu_rs_spark.operators import similarity

    cb = similarity.pq_codebook(corpus, m=M, ksub=KSUB, vec_col="embedding")
    p = str(tmp_path / "store_pq_seed")
    idx = similarity.IvfpqLakeIndex(spark, p)
    idx.build(corpus, cents, codebook=cb)
    return idx, p


class TestCompactAndRefreshInteraction:
    def test_compact_purges_before_merge_no_resurrection(
        self, spark, emb, cents, tmp_path
    ):
        """The epoch merge renumbers merged rows into the second-
        highest epoch; a tombstone surviving into that rewrite would
        resurrect deleted rows (epoch_cut no longer covers them).
        compact purges first — pin the end state: deleted ids stay
        gone through compaction and the tombstone tree is spent."""
        seed = emb.where(F.col("vec_id") % 3 == 0)
        idx, p = _build_percell(spark, emb, cents, tmp_path, corpus=seed)
        idx.add_batch(emb.where(F.col("vec_id") % 3 == 1))  # epoch 1
        idx.add_batch(emb.where(F.col("vec_id") % 3 == 2), epoch=2)
        queries = emb.where(F.col("vec_id") < 6)
        doomed = emb.where(F.col("vec_id") % 7 == 3)
        idx.delete(doomed)
        want = _rows(idx.probe(queries, k=5, nprobe=N_CELLS))
        out = idx.compact()
        assert out["purge"]["purged_rows"] > 0
        assert not os.path.isdir(os.path.join(p, "tombstones"))
        dead = {r["vec_id"] for r in doomed.select("vec_id").collect()}
        codes = spark.read.parquet(f"{p}/codes")
        assert codes.where(F.col("neighbor_id").isin(list(dead))).count() == 0
        assert _rows(idx.probe(queries, k=5, nprobe=N_CELLS)) == want

    def test_refresh_books_skips_deleted_drifted_rows(
        self, spark, emb, cents, tmp_path
    ):
        """Drift is counted over the LIVE view: a corpus that no
        longer holds the deleted drifted rows' floats (deleted docs
        are deleted upstream too) must still pass refresh's coverage
        check, and the refresh must not resurrect them."""
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
        )
        batch = emb.join(
            asg.where(F.col("cell") == victim).select("vec_id"), "vec_id"
        )
        idx, p = _build_percell(spark, emb, cents, tmp_path, corpus=seed)
        idx.add_batch(batch)  # drifted epoch: victim cell is zero-book
        # delete a slice of the drifted rows, then refresh from a
        # corpus that has ALSO dropped them
        dead_batch = batch.where(F.col("vec_id") % 2 == 0)
        dead = {r["vec_id"] for r in dead_batch.select("vec_id").collect()}
        assert dead  # fixture sanity
        idx.delete(dead_batch)
        live_corpus = emb.where(~F.col("vec_id").isin(list(dead)))
        res = idx.refresh_books(live_corpus, min_rows=1)
        assert res["refreshed_cells"] == [victim]
        assert res["rows_reencoded"] == batch.count() - len(dead)
        # the drifted partitions' rewrite physically dropped the dead
        # rows; their tombstones now match nothing
        codes = spark.read.parquet(f"{p}/codes")
        assert codes.where(F.col("neighbor_id").isin(list(dead))).count() == 0
        queries = emb.where(F.col("vec_id") < 6)
        assert not (_ids(idx.probe(queries, k=5, nprobe=N_CELLS)) & dead)
