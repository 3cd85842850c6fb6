"""Keyed window operators over the nano timestamp spine (north-star
extension surface — the reference has no window functions, SURVEY.md
§2.8).

Every window here is PARTITIONed by a key — un-keyed (global) windows
funnel the whole dataset through one task and are banned in this
codebase outside of already-reduced inputs. Double aggregates go
through exact DECIMAL accumulation (order-independent across
partitionings/retries); divisions happen once, in IEEE double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def moving_agg_range(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    window_nanos: int,
    ts_col: str = "ts",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Trailing time-range aggregate per key: for each row, count /
    exact sum / avg of `value_col` over rows of the same key with
    `ts in [row.ts - window_nanos, row.ts]`.

    RANGE frame on the long nano spine — rows at equal ts all see the
    same frame, so the result is deterministic under duplicate
    timestamps (a ROWS frame would not be).

    Output: key_cols + ts + value + n_win, sum_win, avg_win.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc())
        .rangeBetween(-window_nanos, 0)
    )
    dec = F.col(value_col).cast("decimal(18,2)")
    return df.select(
        *key_cols,
        ts_col,
        *(carry_cols or []),
        value_col,
        F.count("*").over(w).alias("n_win"),
        F.sum(dec).over(w).cast("double").alias("sum_win"),
        (F.sum(dec).over(w).cast("double") / F.count("*").over(w)).alias(
            "avg_win"
        ),
    )


def topk_per_group(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str,
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per key by `order_col`, total order via
    `tiebreak_col` (ascending) so rank is deterministic.

    Keyed row_number window: each key's rows sort within their own
    partition — scales with the largest single key, not the dataset.

    Output: input columns + rank.
    """
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tiebreak_col).asc(),
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def quantile_disc_per_group(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    quantiles: list[float],
) -> DataFrame:
    """Exact discrete (type-1) quantiles per key: the value at order
    statistic `floor((n-1)*q) + 1` of the ascending sort.

    Discrete quantiles return an actual data value — no interpolation
    arithmetic, so results are bit-identical across engines (continuous
    quantiles interpolate with engine-specific operation order).
    Implemented as one keyed sort window + per-row rank matching; one
    shuffle on the key.

    Output: key_cols + q{NN} columns (e.g. q50, q90).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(value_col).asc())
    ranked = df.select(
        *key_cols,
        F.col(value_col),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy(*key_cols)).alias("_n"),
    )
    aggs = []
    for q in quantiles:
        target = F.floor((F.col("_n") - 1) * F.lit(q)) + 1
        name = f"q{int(round(q * 100)):02d}"
        aggs.append(
            F.max(
                F.when(F.col("_rn") == target, F.col(value_col))
            ).alias(name)
        )
    return ranked.groupBy(*key_cols).agg(*aggs)
