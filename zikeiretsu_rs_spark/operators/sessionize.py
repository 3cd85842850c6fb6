"""Sessionization: gap-based session assignment over an event stream.

Standard lag + cumulative-sum formulation (see the batch pattern in
/opt/skills/guides/pyspark_guide.md "Sessionization"): a new session
starts when the gap to the previous event of the same user exceeds the
threshold; the session id is the running count of session starts.

Scale notes: both windows are partitioned by the user key, so work is
distributed across users and each user's history is processed within
one partition — no global window. Skewed users (bots) are the risk at
100 TB; AQE skew handling covers the shuffle, and the per-user state is
a scan, not a materialized buffer. The streaming variant is
`F.session_window` in streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_nanos: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign session ids and aggregate one row per session.

    Output: user_col, session_id (1-based per user), session_start,
    session_end (nanos), n_events.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # two explicit steps (flag, then running sum) — a lag() nested
    # inside a windowed sum() is not a well-defined single expression
    flagged = df.withColumn(
        "_new_session",
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when((F.col(ts_col) - F.lag(ts_col).over(w)) > F.lit(gap_nanos), 1)
        .otherwise(0)
        .cast("long"),
    )
    with_gap = flagged.withColumn(
        "session_id",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_gap.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )
