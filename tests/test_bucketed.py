"""Bucketed co-located join: both sides pre-bucketed on the join key
must join with NO shuffle (no Exchange in the physical plan)."""

import pytest

from zikeiretsu_rs_spark.catalog.bucketed import read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.createDataFrame(
        [(i % 50, i, float(i)) for i in range(500)], ["k", "lid", "lv"]
    )
    right = spark.createDataFrame(
        [(i % 50, i * 10) for i in range(200)], ["k", "rv"]
    )
    write_bucketed(left, "bk_left", "k", 4, str(tmp_path / "bk_left"))
    write_bucketed(right, "bk_right", "k", 4, str(tmp_path / "bk_right"))
    yield "bk_left", "bk_right"
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_no_exchange_in_colocated_join(spark, bucketed_pair):
    lname, rname = bucketed_pair
    # at real scale neither fact side is broadcastable; emulate that so
    # the planner actually exercises the bucketed layout
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, lname).join(read_table(spark, rname), "k")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # the whole point: no shuffle on either side
        assert "Exchange" not in plan, plan
        assert plan.count("Bucketed: true") == 2, plan
        # correctness
        assert joined.count() == 500 * (200 // 50)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_roundtrip_values(spark, bucketed_pair):
    lname, _ = bucketed_pair
    df = read_table(spark, lname)
    assert df.count() == 500
    assert {r["k"] for r in df.select("k").distinct().collect()} == set(range(50))
