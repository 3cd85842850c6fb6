"""Composed crawl-pipeline e2e (VERDICT r06 item 7): ONE stream of
documents-with-a-metrics-spine drives BOTH the warehouse ingest
(block + manifest + rollup) and the exact incremental-dedup index,
and a mid-stream failure/replay leaves every artifact consistent:

- manifest: exactly one block per logical micro-batch (the per-epoch
  ingest ledger makes the replayed persist a no-op);
- rollup: incremental refresh equals a full recompute from raw;
- verdicts: byte-identical to ONE incremental_dedup run over
  everything streamed (the cross-batch ≡ batch invariant), no
  duplicate or missing epochs.
"""

import shutil as sh

import pytest
from pyspark.sql import functions as F

from zikeiretsu_rs_spark.catalog.rollup import Rollup
from zikeiretsu_rs_spark.datamodel import FieldType
from zikeiretsu_rs_spark.datetime_util import NANOS_PER_SEC
from zikeiretsu_rs_spark.engine import Engine
from zikeiretsu_rs_spark.operators import dedup
from zikeiretsu_rs_spark.streaming.ingest import (
    start_streaming_crawl_pipeline,
)
from zikeiretsu_rs_spark.streaming.neardup import IncrementalDedupIndex

from test_datetime_util import nanos

HOUR = 3600 * NANOS_PER_SEC

CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "one two three four five six seven eight nine"),
]
BATCH1 = [
    (10, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
    (11, "fresh crawl content with no earlier relatives at all"),
]
BATCH2 = [
    (20, "fresh crawl content with no earlier relatives at all"),  # dup of 11
    (21, "novel second batch text that matches nothing before"),
]

SCHEMA = "doc_id long, text string, ts long, f0 double"


def _rows(batch, base):
    return [
        (i, t, base + i * NANOS_PER_SEC, float(len(t))) for i, t in batch
    ]


def _write_batch_file(spark, rows, tmp_path, src, name):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    stage = tmp_path / f"_stage_{name}"
    df.write.mode("overwrite").parquet(str(stage))
    for f in stage.glob("part-*.parquet"):
        sh.copy(f, src / f"{name}.parquet")


def _ground_truth(spark, streamed):
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


class TestCrawlPipelineE2E:
    def test_failure_and_replay_keep_all_artifacts_consistent(
        self, spark, tmp_ctx, tmp_path
    ):
        engine = Engine(spark, tmp_ctx)
        store = engine.writable_store("crawl", [FieldType.FLOAT64])
        rollup = Rollup(tmp_ctx.db_dir(), "crawl", "hourly", HOUR)
        idx = IncrementalDedupIndex(
            spark, str(tmp_path / "dedup_index"), threshold=0.5
        )
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))

        base = nanos(2024, 3, 1)
        src = tmp_path / "src"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        _write_batch_file(spark, _rows(BATCH1, base), tmp_path, src, "b1")

        def start(index):
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src))
            )
            return start_streaming_crawl_pipeline(
                stream, store, index, ckpt, rollups=[rollup]
            )

        q = start(idx)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert {
            (r["doc_id"], r["is_kept"], r["dup_of"])
            for r in idx.verdicts().collect()
        } == _ground_truth(spark, BATCH1)
        assert len(store.manifest.load()) == 1  # one block for batch 1

        # ---- mid-stream failure on batch 2: the dedup stage dies
        # AFTER the block persisted (the worst half-done state) ----
        class FailingOnce:
            def __init__(self, inner):
                self.inner = inner
                self.fired = False

            def add_batch(self, *a, **k):
                if not self.fired:
                    self.fired = True
                    raise RuntimeError("injected crash mid-epoch")
                return self.inner.add_batch(*a, **k)

        _write_batch_file(spark, _rows(BATCH2, base), tmp_path, src, "b2")
        failing = FailingOnce(idx)
        q = start(failing)
        with pytest.raises(Exception, match="injected crash"):
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        assert failing.fired
        # the crash landed after the persist: block 2 is durable, the
        # verdicts for batch 2 are not committed yet
        assert len(store.manifest.load()) == 2
        assert {
            r["doc_id"] for r in idx.verdicts().collect() if r["doc_id"] >= 20
        } == set()

        # ---- restart with the SAME checkpoint: epoch replays ----
        q = start(idx)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        # verdicts: cross-batch == one-shot ground truth, no dup rows
        got = [
            (r["doc_id"], r["is_kept"], r["dup_of"])
            for r in idx.verdicts().collect()
        ]
        assert set(got) == _ground_truth(spark, BATCH1 + BATCH2)
        assert len(got) == len(set(got))  # replay did not duplicate

        # manifest: STILL one block per logical batch — the ledger
        # made the replayed persist a no-op
        entries = store.manifest.load()
        assert len(entries) == 2
        assert sum(e.rows for e in entries) == len(BATCH1) + len(BATCH2)

        # warehouse rows: exactly the streamed rows, no duplicates
        df = engine.execute_to_df(
            "with format_datetime = false select * from crawl "
            "where ts >= '2024-03-01'",
            now_nanos=base,
        )
        assert df.count() == len(BATCH1) + len(BATCH2)

        # rollup: incremental state == full recompute from raw
        rollup.refresh(spark)
        raw = (
            engine.execute_to_df(
                "with format_datetime = false select * from crawl "
                "where ts >= '2024-03-01'",
                now_nanos=base,
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("f0").cast("decimal(18,2)")).alias("s"),
            )
            .collect()[0]
        )
        rolled = rollup.read(spark).agg(
            F.sum("n").alias("n"),
            F.sum(F.col("sum_value").cast("decimal(18,2)")).alias("s"),
        ).collect()[0]
        assert (rolled["n"], rolled["s"]) == (raw["n"], raw["s"])


class TestMultiFieldSpine:
    def test_pipeline_persists_every_declared_field(
        self, spark, tmp_ctx, tmp_path
    ):
        """ADVICE r07 / VERDICT r08 item 2: the block persist used to
        hardcode select('ts', 'f0'), silently dropping f1..fn for
        stores declared with more field types. The spine projection
        must follow store.field_types. Store schema is the reference's
        own persist-demo shape — (Bool, Float64, Float64), see
        zikeiretsu/example/persist/src/main.rs:38-76."""
        engine = Engine(spark, tmp_ctx)
        store = engine.writable_store(
            "crawl2",
            [FieldType.BOOL, FieldType.FLOAT64, FieldType.FLOAT64],
        )
        idx = IncrementalDedupIndex(
            spark, str(tmp_path / "dedup_index2"), threshold=0.5
        )
        idx.build(spark.createDataFrame(CORPUS, ["doc_id", "text"]))

        base = nanos(2024, 3, 2)
        schema = (
            "doc_id long, text string, ts long, "
            "f0 boolean, f1 double, f2 double"
        )
        rows = [
            (
                i,
                t,
                base + i * NANOS_PER_SEC,
                i % 2 == 0,
                float(len(t)),
                float(i) / 2.0,
            )
            for i, t in BATCH1
        ]
        src = tmp_path / "src2"
        src.mkdir()
        df = spark.createDataFrame(rows, schema).coalesce(1)
        stage = tmp_path / "_stage_mf"
        df.write.mode("overwrite").parquet(str(stage))
        for f in stage.glob("part-*.parquet"):
            sh.copy(f, src / "b1.parquet")

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = start_streaming_crawl_pipeline(
            stream, store, idx, str(tmp_path / "ckpt2")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out = engine.execute_to_df(
            "with format_datetime = false select * from crawl2 "
            "where ts >= '2024-03-02'",
            now_nanos=base,
        )
        got = {
            (r["f0"], r["f1"], r["f2"]) for r in out.collect()
        }
        assert got == {
            (i % 2 == 0, float(len(t)), float(i) / 2.0) for i, t in BATCH1
        }
