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


def assign_sessions(
    df: DataFrame,
    gap_nanos: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-EVENT session assignment: every input row plus a
    `session_id` (1-based per user). Deterministic under duplicate
    timestamps: the gap flag depends only on ts values, so tie order
    cannot change any row's session."""
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
    return flagged.withColumn(
        "session_id",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new_session")


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
    return assign_sessions(df, gap_nanos, user_col, ts_col).groupBy(
        user_col, "session_id"
    ).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )


def funnel(
    df: DataFrame,
    stages: list[str],
    gap_nanos: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion at session granularity: a session
    reaches stage k when the FIRST occurrences of stages[0..k] appear
    in non-decreasing timestamp order within the session (the classic
    product-analytics funnel; equal timestamps count as in-order).

    Scale shape: session assignment is the keyed-window pass, stage
    first-hits are one map-side-combined aggregate per session, and
    the funnel counts are a single 1-row aggregate expanded to one row
    per stage with `stack` — no joins, no second scan.

    Output: stage_idx, stage, n_sessions, conversion (vs stage 0,
    round 6).
    """
    ev = assign_sessions(df, gap_nanos, user_col, ts_col)
    firsts = ev.groupBy(user_col, "session_id").agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"_t{i}")
            for i in range(len(stages))
            for s in [stages[i]]
        ]
    )
    reached = None
    flags = []
    for i in range(len(stages)):
        cond = F.col(f"_t{i}").isNotNull()
        if i > 0:
            cond = cond & (F.col(f"_t{i}") >= F.col(f"_t{i-1}")) & reached
        flags.append(F.sum(cond.cast("long")).alias(f"_n{i}"))
        reached = cond
    totals = firsts.agg(*flags)
    stack_args = ", ".join(
        f"{i}, '{s}', _n{i}" for i, s in enumerate(stages)
    )
    staged = totals.select(
        F.expr(
            f"stack({len(stages)}, {stack_args}) AS (stage_idx, stage, n_sessions)"
        ),
        F.col("_n0").alias("_base"),
    )
    return staged.select(
        "stage_idx",
        "stage",
        "n_sessions",
        # NULL when no session reaches stage 0 (empty-funnel edge case
        # caught by the hypothesis monotonicity property)
        F.when(
            F.col("_base") > 0,
            F.round(F.col("n_sessions") / F.col("_base"), 6),
        ).alias("conversion"),
    )
