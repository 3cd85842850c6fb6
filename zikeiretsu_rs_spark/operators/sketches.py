"""Approximate/mergeable aggregation sketches.

At 100 TB, exact distinct counts and quantiles force a full shuffle of
the keys; sketches reduce that to fixed-size state that is MERGEABLE —
the property that makes incremental rollups work: build one sketch per
partition/day, union sketches instead of re-scanning history.

- approx_distinct_by: HyperLogLog++ distinct counts per key
  (`approx_count_distinct`, rsd-tunable).
- hll_rollup / hll_merge: Apache DataSketches HLL state as a binary
  column (`hll_sketch_agg` / `hll_union_agg`) — build daily, merge to
  any coarser grain without touching raw data.
- approx_quantiles_by: Greenwald-Khanna quantiles per key
  (`percentile_approx`) — single pass, bounded memory, vs the exact
  sort-based `windows.quantile_disc_per_group`.

All JVM-side built-ins; deterministic for a fixed input (no sampling),
but approximate — so these pair with the exact operators for
small-scale verification and have no DuckDB oracle by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, key_cols: list[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-key approximate distinct count (HLL++, relative std dev
    `rsd`). Output: key_cols + approx_distinct."""
    return df.groupBy(*key_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )


def hll_rollup(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Build a mergeable HLL sketch per key (binary `hll` column).
    Persist this per day/partition; coarser rollups come from
    `hll_merge` over the sketches, never from re-scanning raw data."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll")
    )


def hll_merge(
    sketches: DataFrame, key_cols: list[str], hll_col: str = "hll"
) -> DataFrame:
    """Merge HLL sketches to a coarser key grain and extract the
    estimate. Output: key_cols + approx_distinct."""
    return sketches.groupBy(*key_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(hll_col))).alias(
            "approx_distinct"
        )
    )


def approx_quantiles_by(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    quantiles: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-key single-pass approximate quantiles (Greenwald-Khanna).
    Output: key_cols + q{NN} columns (same naming as the exact
    `quantile_disc_per_group` so the two are drop-in comparable)."""
    aggs = [
        F.percentile_approx(value_col, q, accuracy).alias(
            f"q{int(round(q * 100)):02d}"
        )
        for q in quantiles
    ]
    return df.groupBy(*key_cols).agg(*aggs)
