"""Distinct-timestamp head/tail limits.

Reference semantics (time_series_dataframe.rs:105-153, "the same
timestamps counts as one"): `ts >=|n t` keeps the first n *distinct*
timestamp values and every row that carries one of them; `ts <=|n t`
keeps the last n. A plain LIMIT n is wrong when duplicates exist.

Scale design: the obvious translation — `dense_rank() OVER (ORDER BY
ts)` — funnels the whole dataset through ONE partition (an un-keyed
window), which is a non-starter at 100 TB. Instead we compute the n-th
distinct timestamp as a scalar threshold and semi-filter on it:

    distinct(ts) -> orderBy(ts) -> limit(n)   # TakeOrderedAndProject:
                                              # per-partition top-n, tiny
    threshold = max(of those n)               # 1-row aggregate
    df.filter(ts <= threshold)                # pushed down to the scan

Both stages are fully parallel: `distinct` is a map-side-combined
shuffle on ts, `orderBy().limit(n)` compiles to TakeOrderedAndProject
(no global sort), and the final filter is a broadcast of one scalar.
The filter is re-evaluated against Parquet row-group stats, so at scale
most files are skipped entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def limit_distinct_ts(
    df: DataFrame, n: int, *, tail: bool = False, ts_col: str = "ts"
) -> DataFrame:
    """Keep rows belonging to the first (or last) `n` distinct `ts_col`
    values. `n == 0` returns an empty frame (Head(0)/Tail(0) -> empty,
    time_series_dataframe.rs:120-153)."""
    if n <= 0:
        return df.limit(0)
    order: Column = F.col(ts_col).desc() if tail else F.col(ts_col).asc()
    bound = F.min(ts_col) if tail else F.max(ts_col)
    thr = (
        df.select(ts_col)
        .distinct()
        .orderBy(order)
        .limit(n)
        .agg(bound.alias("__ts_threshold"))
    )
    pred = (
        F.col(ts_col) >= F.col("__ts_threshold")
        if tail
        else F.col(ts_col) <= F.col("__ts_threshold")
    )
    # 1-row broadcast cross join, then a scan-pushable comparison
    return df.join(F.broadcast(thr)).where(pred).drop("__ts_threshold")
