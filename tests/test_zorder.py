"""Z-order clustering: multi-dimensional row-group pruning, measured
against the parquet footer statistics the scanner actually uses."""

import glob

import duckdb
import pytest
from pyspark.sql import functions as F

from zikeiretsu_rs_spark.catalog import zorder


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    n = 200_000
    df = spark.range(n).select(
        (F.xxhash64("id") % 1000).alias("user_id"),
        F.col("id").alias("ts"),
        (F.xxhash64("id", F.lit(1)) % 100).alias("value"),
    )
    plain = str(base / "plain")
    zpath = str(base / "z")
    df.repartitionByRange(32, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(plain)
    zorder.zorder_write(df, ["user_id", "ts"], zpath, n_files=32)
    return df, plain, zpath


def _matching(path, pred_sql):
    con = duckdb.connect()
    q = f"""
    WITH rg AS (
      SELECT file_name, row_group_id,
             max(CASE WHEN path_in_schema='user_id'
                 THEN stats_min_value::BIGINT END) AS umin,
             max(CASE WHEN path_in_schema='user_id'
                 THEN stats_max_value::BIGINT END) AS umax,
             max(CASE WHEN path_in_schema='ts'
                 THEN stats_min_value::BIGINT END) AS tmin,
             max(CASE WHEN path_in_schema='ts'
                 THEN stats_max_value::BIGINT END) AS tmax
      FROM parquet_metadata('{path}/*.parquet')
      WHERE path_in_schema IN ('user_id','ts') GROUP BY 1,2)
    SELECT count(*), count(*) FILTER ({pred_sql}) FROM rg
    """
    return con.sql(q).fetchone()


class TestZorderPruning:
    def test_rows_identical_across_layouts(self, spark, layouts):
        df, plain, zpath = layouts
        cond = (F.col("user_id").between(100, 140)) & (
            F.col("ts").between(20_000, 60_000)
        )
        a = sorted(map(tuple, spark.read.parquet(plain).where(cond).collect()))
        b = sorted(map(tuple, spark.read.parquet(zpath).where(cond).collect()))
        assert a == b and len(a) > 0

    def test_two_dim_box_prunes_at_least_as_well(self, layouts):
        _, plain, zpath = layouts
        pred = ("umax >= 100 AND umin <= 140 AND "
                "tmax >= 20000 AND tmin <= 60000")
        _, mp = _matching(plain, pred)
        _, mz = _matching(zpath, pred)
        assert mz <= mp

    def test_secondary_dim_predicate_prunes_where_plain_cannot(
        self, layouts
    ):
        """user_id-only predicate: the ts-sorted layout has arbitrary
        user_id ranges per row group (reads everything); the z-ordered
        layout must skip a majority of row groups."""
        _, plain, zpath = layouts
        pred = "umax >= 100 AND umin <= 140"
        tp, mp = _matching(plain, pred)
        tz, mz = _matching(zpath, pred)
        assert mp == tp  # plain layout cannot prune on the second dim
        assert mz <= tz // 2  # z-order skips at least half
