"""Deterministic content-hash sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE sampling: `df.sample(seed)`
depends on partition layout (same seed, different cluster -> different
rows), which breaks lineage, incremental reruns, and cross-engine
validation. Content-hash sampling decides per ROW from a stable key —
the same row lands in the same sample/split on any engine, any
partitioning, forever. md5 is used because both Spark and DuckDB
implement it identically (the oracle checks these operators exactly).

Rates are expressed in 1/256ths (two hex digits of the digest) —
granular enough for pipeline work while keeping the predicate a cheap
string compare on the first byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket256(key: Column) -> Column:
    """Stable per-row bucket in [0, 256): first digest byte."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 2), 16, 10).cast(
        "int"
    )


def deterministic_sample(
    df: DataFrame, key_col: str, rate_256: int
) -> DataFrame:
    """Keep rows whose content-hash bucket < rate_256 (sampling rate =
    rate_256/256). Same rows selected on every engine/partitioning."""
    return df.where(_bucket256(F.col(key_col)) < rate_256)


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_256: int = 26,
    valid_256: int = 26,
) -> DataFrame:
    """Attach a stable split label: buckets [0, test) -> test,
    [test, test+valid) -> valid, rest -> train. Rows never migrate
    between splits as the dataset grows (hash-range assignment), the
    property that keeps eval sets leak-free across pipeline reruns."""
    b = _bucket256(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(b < test_256, F.lit("test"))
        .when(b < test_256 + valid_256, F.lit("valid"))
        .otherwise(F.lit("train")),
    )
