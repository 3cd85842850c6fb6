"""Sketch operators: accuracy vs exact within bounds, and the
load-bearing property — HLL sketches merged across partitions equal
the sketch built in one pass (mergeability = incremental rollups)."""

import pytest
from pyspark.sql import functions as F

from zikeiretsu_rs_spark.operators import sketches, windows


@pytest.fixture(scope="module")
def keyed(spark):
    rows = [
        ("a", i % 137, float(i % 100)) for i in range(2000)
    ] + [
        ("b", i % 61, float(i % 50)) for i in range(1000)
    ]
    return spark.createDataFrame(rows, ["k", "uid", "value"]).withColumn(
        "day", (F.col("uid") % 3).alias("day")
    )


class TestApproxDistinct:
    def test_within_rsd(self, keyed):
        got = {
            r["k"]: r["approx_distinct"]
            for r in sketches.approx_distinct_by(keyed, ["k"], "uid").collect()
        }
        assert got["a"] == pytest.approx(137, rel=0.1)
        assert got["b"] == pytest.approx(61, rel=0.1)


class TestHllMergeability:
    def test_daily_union_equals_single_pass(self, keyed):
        # per-(key, day) sketches merged up to key...
        daily = sketches.hll_rollup(keyed, ["k", "day"], "uid")
        merged = {
            r["k"]: r["approx_distinct"]
            for r in sketches.hll_merge(daily, ["k"]).collect()
        }
        # ...must equal the sketch built over the raw data in one pass
        direct = {
            r["k"]: r["approx_distinct"]
            for r in sketches.hll_merge(
                sketches.hll_rollup(keyed, ["k"], "uid"), ["k"]
            ).collect()
        }
        assert merged == direct
        assert merged["a"] == pytest.approx(137, rel=0.05)


class TestApproxQuantiles:
    def test_close_to_exact(self, keyed):
        approx = {
            r["k"]: (r["q50"], r["q90"])
            for r in sketches.approx_quantiles_by(
                keyed, ["k"], "value", [0.5, 0.9]
            ).collect()
        }
        exact = {
            r["k"]: (r["q50"], r["q90"])
            for r in windows.quantile_disc_per_group(
                keyed, ["k"], "value", [0.5, 0.9]
            ).collect()
        }
        for k in exact:
            assert approx[k][0] == pytest.approx(exact[k][0], abs=2.0)
            assert approx[k][1] == pytest.approx(exact[k][1], abs=2.0)


class TestHeavyHitters:
    """Misra-Gries invariants — theorems that must hold for ANY
    partitioning and any item order."""

    def _check(self, spark, items, capacity, n_parts):
        df = spark.createDataFrame(
            [(x,) for x in items], ["item"]
        ).repartition(n_parts)
        summary = sketches.space_saving_summary(df, "item", capacity).collect()
        delta = sum(r["pdelta"] for r in summary)
        hh = {
            r["item"]: (r["est"], r["err_bound"])
            for r in sketches.heavy_hitters(df, "item", capacity).collect()
        }
        import collections

        true = collections.Counter(items)
        if hh:  # the merged view must agree with the raw summaries
            assert next(iter(hh.values()))[1] == delta
        for item, cnt in true.items():
            if item in hh:
                est = hh[item][0]
                assert est <= cnt <= est + delta, (item, est, cnt, delta)
            else:
                assert cnt <= delta, (item, cnt, delta)
        return hh, delta

    def test_zipf_stream_tracks_heavies(self, spark):
        items = (
            ["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 120
            + [f"tail{i}" for i in range(200)]
        )
        hh, delta = self._check(spark, items, capacity=8, n_parts=4)
        # the three heavies dominate the error bound -> must be found
        assert {"alpha", "beta", "gamma"} <= set(hh)

    def test_adversarial_uniform_stream(self, spark):
        # uniform items: nothing is guaranteed to survive, but the
        # bound invariants must still hold
        items = [f"u{i % 50}" for i in range(1000)]
        self._check(spark, items, capacity=4, n_parts=8)

    def test_partitioning_invariance_of_guarantee(self, spark):
        items = ["hot"] * 400 + [f"t{i}" for i in range(300)]
        for parts in (1, 3, 16):
            hh, delta = self._check(spark, items, capacity=8, n_parts=parts)
            assert "hot" in hh

    def test_summary_size_bounded(self, spark):
        items = [f"x{i}" for i in range(2000)]
        df = spark.createDataFrame([(x,) for x in items], ["item"]).repartition(6)
        s = sketches.space_saving_summary(df, "item", capacity=16)
        rows = s.collect()
        assert len(rows) <= 6 * 17
        per_part_items = [r for r in rows if r["item"] is not None]
        assert len(per_part_items) <= 6 * 16


class TestCountMinSketch:
    """Count-Min sketch: one-sided error theorem, cell-exact
    mergeability, and partitioning invariance."""

    def _corpus(self, spark, seed=5, n=400):
        import random

        rng = random.Random(seed)
        rows = [(i, rng.choice("abcdefgh") * rng.randint(1, 3)) for i in range(n)]
        return spark.createDataFrame(rows, ["i", "item"])

    def test_never_underestimates(self, spark):
        from zikeiretsu_rs_spark.operators import sketches

        df = self._corpus(spark)
        cms = sketches.cms_build(df, "item", depth=3, width=16)
        true = df.groupBy(F.col("item")).count().withColumnRenamed(
            "count", "true_cnt"
        )
        est = sketches.cms_estimate(cms, true, "item", depth=3, width=16)
        for r in est.collect():
            assert r["cms_est"] >= r["true_cnt"], r

    def test_merge_equals_single_build(self, spark):
        from zikeiretsu_rs_spark.operators import sketches

        df = self._corpus(spark)
        half_a = df.where(F.col("i") % 2 == 0)
        half_b = df.where(F.col("i") % 2 == 1)
        merged = sketches.cms_merge(
            sketches.cms_build(half_a, "item", depth=3, width=16).unionAll(
                sketches.cms_build(half_b, "item", depth=3, width=16)
            )
        )
        single = sketches.cms_build(df, "item", depth=3, width=16)
        key = lambda rows: sorted(
            (r["j"], r["bucket"], r["cnt"]) for r in rows
        )
        assert key(merged.collect()) == key(single.collect())

    def test_partitioning_invariance(self, spark):
        from zikeiretsu_rs_spark.operators import sketches

        df = self._corpus(spark)
        a = sketches.cms_build(df.repartition(1), "item", depth=3, width=16)
        b = sketches.cms_build(df.repartition(7, "item"), "item", depth=3, width=16)
        key = lambda rows: sorted(
            (r["j"], r["bucket"], r["cnt"]) for r in rows
        )
        assert key(a.collect()) == key(b.collect())

    def test_wide_sketch_is_exact_for_distinct_items(self, spark):
        from zikeiretsu_rs_spark.operators import sketches

        # width >> items and 4 independent rows: collisions in ALL
        # rows simultaneously are overwhelmingly unlikely -> exact
        rows = [(i, f"item{i % 20}") for i in range(200)]
        df = spark.createDataFrame(rows, ["i", "item"])
        cms = sketches.cms_build(df, "item", depth=4, width=4096)
        true = df.groupBy("item").count().withColumnRenamed("count", "true_cnt")
        est = sketches.cms_estimate(cms, true, "item", depth=4, width=4096)
        for r in est.collect():
            assert r["cms_est"] == r["true_cnt"] == 10

    def test_weighted_build(self, spark):
        from zikeiretsu_rs_spark.operators import sketches

        df = spark.createDataFrame(
            [("a", 5), ("a", 7), ("b", 1)], ["item", "wt"]
        )
        cms = sketches.cms_build(df, "item", weight_col="wt", depth=2, width=64)
        items = spark.createDataFrame([("a",), ("b",)], ["item"])
        est = {
            r["item"]: r["cms_est"]
            for r in sketches.cms_estimate(
                cms, items, "item", depth=2, width=64
            ).collect()
        }
        assert est["a"] >= 12 and est["b"] >= 1
