"""SemanticDedupIndex — the streaming/cosine leg of the incremental
dedup family: cross-batch verdicts must equal the one-shot
semantic_dedup over everything streamed so far (restricted to
post-seed rows), epochs must replay idempotently, compaction must
preserve the ledger and survive redelivery, and the foreachBatch
wrapper must compose with in-stream compaction.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def cents(emb):
    from zikeiretsu_rs_spark.operators import similarity

    return similarity.head_centroids(emb, 8, "vec_id", "embedding")


def _splits(emb):
    """Seed + two batches with globally increasing ids (the ledger
    invariant's precondition)."""
    n = emb.count()
    a, b = n // 2, 3 * n // 4
    return (
        emb.where(F.col("vec_id") < a),
        emb.where((F.col("vec_id") >= a) & (F.col("vec_id") < b)),
        emb.where(F.col("vec_id") >= b),
    )


def _one_shot(emb, cents, min_id, threshold=0.40):
    from zikeiretsu_rs_spark.operators import similarity

    return (
        similarity.semantic_dedup(emb, threshold=threshold, centroids=cents)
        .where(F.col("vec_id") >= min_id)
        .select("vec_id", "dup_of", "is_kept")
    )


class TestSemanticDedupIndex:
    def test_cross_batch_equals_one_shot(self, spark, emb, cents, tmp_path):
        from zikeiretsu_rs_spark.streaming.neardup import SemanticDedupIndex

        seed, b1, b2 = _splits(emb)
        n = emb.count()
        idx = SemanticDedupIndex(spark, str(tmp_path / "sem"), threshold=0.40)
        idx.build(seed, cents)
        v1 = idx.add_batch(b1)
        v2 = idx.add_batch(b2)
        assert v1.count() == b1.count() and v2.count() == b2.count()
        # cumulative ledger == semantic_dedup over everything streamed,
        # restricted to post-seed rows (ids are globally increasing)
        assert _rows(idx.verdicts()) == _rows(
            _one_shot(emb, cents, n // 2)
        )
        # at least one real cross-relation exists in the fixture
        assert any(not r[2] for r in idx.verdicts().collect())

    def test_expression_scoring_knob_matches_arrow(
        self, spark, emb, cents, tmp_path
    ):
        # arrow_pairs=False (the memory escape hatch for a mega-cell
        # history whose vectors exceed task memory) must produce the
        # identical ledger through the expression join
        from zikeiretsu_rs_spark.streaming.neardup import SemanticDedupIndex

        seed, b1, b2 = _splits(emb)
        ia = SemanticDedupIndex(spark, str(tmp_path / "a"), threshold=0.40)
        ie = SemanticDedupIndex(
            spark, str(tmp_path / "e"), threshold=0.40, arrow_pairs=False
        )
        for idx in (ia, ie):
            idx.build(seed, cents)
            idx.add_batch(b1)
            idx.add_batch(b2)
        assert _rows(ia.verdicts()) == _rows(ie.verdicts())

    def test_epoch_replay_is_idempotent(self, spark, emb, cents, tmp_path):
        from zikeiretsu_rs_spark.streaming.neardup import SemanticDedupIndex

        seed, b1, _ = _splits(emb)
        idx = SemanticDedupIndex(spark, str(tmp_path / "sem"), threshold=0.40)
        idx.build(seed, cents)
        before = _rows(idx.add_batch(b1, epoch=1))
        assert _rows(idx.add_batch(b1, epoch=1)) == before  # redelivery
        assert _rows(idx.verdicts()) == before
        with pytest.raises(ValueError, match="start at 1"):
            idx.add_batch(b1, epoch=0)

    def test_build_requires_meta_and_clears_stale(
        self, spark, emb, cents, tmp_path
    ):
        from zikeiretsu_rs_spark.streaming.neardup import SemanticDedupIndex

        seed, b1, _ = _splits(emb)
        idx = SemanticDedupIndex(spark, str(tmp_path / "sem"))
        with pytest.raises(FileNotFoundError, match="index_meta"):
            idx.add_batch(b1)
        idx.build(seed, cents)
        idx.add_batch(b1)
        # rebuild in place: stale epochs cleared (the IvfpqLakeIndex
        # rebuild contract)
        idx.build(seed, cents)
        from zikeiretsu_rs_spark.streaming.neardup import _epoch_dirs

        assert _epoch_dirs(idx.cells_dir) == [0]
        assert idx.verdicts().count() == 0

    def test_compaction_preserves_ledger_and_redelivery(
        self, spark, emb, cents, tmp_path
    ):
        from zikeiretsu_rs_spark.streaming.neardup import SemanticDedupIndex

        seed, b1, b2 = _splits(emb)
        plain = SemanticDedupIndex(spark, str(tmp_path / "p"), threshold=0.40)
        compd = SemanticDedupIndex(spark, str(tmp_path / "c"), threshold=0.40)
        for idx in (plain, compd):
            idx.build(seed, cents)
            idx.add_batch(b1, epoch=1)
            idx.add_batch(b2, epoch=2)
        before = _rows(compd.verdicts())
        stats = compd.compact()
        assert stats["epochs_before"] == 3 and stats["epochs_after"] == 2
        assert _rows(compd.verdicts()) == before
        # the judged-review data-loss scenario: redeliver the (never
        # absorbed) highest epoch after compaction
        compd.add_batch(b2, epoch=2)
        assert _rows(compd.verdicts()) == before
        # post-compaction batches: identical verdicts vs the twin
        extra = emb.where(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
        v_c = _rows(compd.add_batch(extra))
        v_p = _rows(plain.add_batch(extra))
        assert v_c == v_p
        # near-identical vectors to existing ones -> dropped
        assert any(not r[2] for r in v_c)

    def test_streaming_wrapper_with_in_stream_compaction(
        self, spark, emb, cents, tmp_path
    ):
        import shutil as sh

        from zikeiretsu_rs_spark.streaming.neardup import (
            SemanticDedupIndex,
            start_streaming_semantic_dedup,
        )

        seed, b1, b2 = _splits(emb)
        n = emb.count()
        idx = SemanticDedupIndex(spark, str(tmp_path / "sem"), threshold=0.40)
        idx.build(seed, cents)
        src = tmp_path / "src"
        src.mkdir()
        for i, batch in enumerate((b1, b2)):
            staged = tmp_path / f"s{i}"
            batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
            for f in staged.glob("part-*.parquet"):
                sh.copy(f, src / f"b{i}.parquet")
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = start_streaming_semantic_dedup(
            stream, idx, str(tmp_path / "ckpt"), compact_every=2
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        from zikeiretsu_rs_spark.streaming.neardup import _epoch_dirs

        # batch 1 (epoch 2) triggered compact: [0,1,2] -> [1,2]
        assert _epoch_dirs(idx.cells_dir) == [1, 2]
        assert _rows(idx.verdicts()) == _rows(_one_shot(emb, cents, n // 2))


class TestSemanticCdcTakedowns:
    """The cosine leg of the round-12 takedown feed: the semantic
    wrapper's mode="cdc" shares _cdc_batch with the incremental
    wrapper (I/U index the vector, D forgets the id; one epoch-pinned
    tombstone batch at batch=-epoch, cut=epoch-1)."""

    def test_cdc_feed_indexes_and_forgets_e2e(
        self, spark, emb, cents, tmp_path
    ):
        import os
        import shutil as sh

        from zikeiretsu_rs_spark.streaming.neardup import (
            SemanticDedupIndex,
            start_streaming_semantic_dedup,
        )

        seed, b1, b2 = _splits(emb)
        p = str(tmp_path / "sem")
        idx = SemanticDedupIndex(spark, p, threshold=0.40)
        idx.build(seed, cents)
        # ground truth for batch 2 under the takedown: a twin index
        # whose history simply never held the forgotten ids
        doomed = [
            r["vec_id"]
            for r in b1.select("vec_id").limit(3).collect()
        ]
        truth = SemanticDedupIndex(
            spark, str(tmp_path / "truth"), threshold=0.40
        )
        truth.build(seed, cents)
        truth.add_batch(b1.where(~F.col("vec_id").isin(doomed)), epoch=1)
        want2 = _rows(truth.add_batch(b2, epoch=2))

        src = tmp_path / "src"
        src.mkdir()
        cdc_schema = "vec_id long, embedding array<float>, op string"

        def feed(name, df):
            staged = tmp_path / f"_stage_{name}"
            df.coalesce(1).write.mode("overwrite").parquet(str(staged))
            for f in staged.glob("part-*.parquet"):
                sh.copy(f, src / f"{name}.parquet")

        feed("b1", b1.withColumn("op", F.lit("I")).select(
            "vec_id", "embedding", "op"))
        stream = (
            spark.readStream.schema(cdc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = start_streaming_semantic_dedup(
            stream, idx, str(tmp_path / "ckpt"), mode="cdc"
        )
        try:
            q.processAllAvailable()
            feed(
                "b2",
                spark.createDataFrame(
                    [(i, None, "D") for i in doomed], cdc_schema
                ).unionByName(
                    b2.withColumn("op", F.lit("I")).select(
                        "vec_id", "embedding", "op"
                    )
                ),
            )
            q.processAllAvailable()
        finally:
            q.stop()
        got2 = _rows(
            spark.read.parquet(f"{p}/verdicts/epoch=2").select(
                "vec_id", "dup_of", "is_kept"
            )
        )
        assert got2 == want2
        assert os.path.isdir(os.path.join(p, "tombstones", "batch=-2"))
        # physical completion through the standing purge path
        idx.purge_forgotten()
        cells = spark.read.schema(
            "vec_id long, vec array<double>, norm double"
        ).parquet(os.path.join(p, "cells"))
        assert cells.where(F.col("vec_id").isin(doomed)).count() == 0
