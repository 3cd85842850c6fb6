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
