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
