"""Bucketed (co-located) table layout for shuffle-free fact-fact joins.

Broadcast handles dim joins; at 100 TB the expensive joins are
fact-to-fact on a shared key (lineitem x orders, events x sessions).
Writing both sides bucketed by the join key into the same bucket count
pre-partitions the data ON DISK: Catalyst sees compatible output
partitioning on both scans and plans a SortMergeJoin with NO Exchange —
the single biggest shuffle eliminated from a recurring pipeline.

This is the Spark-native analog of the reference's "blocks sorted and
indexed by key" layout, generalized from ts to any join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    location: str,
    sort_col: str | None = None,
) -> None:
    """Persist a DataFrame as a bucketed+sorted Parquet table in the
    session catalog (explicit LOCATION so tests control the path).
    Bucket counts must match across tables meant to co-join."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", location)
        .bucketBy(n_buckets, bucket_col)
    )
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back THROUGH THE CATALOG (reading the
    parquet path directly loses bucketing metadata and reintroduces
    the shuffle)."""
    return spark.table(table_name)
