"""Time-series analytics operators over the nano spine — the
aggregations a zikeiretsu user would reach for next (the reference
dialect has none, SURVEY §2.7): time-weighted averages for
irregularly-sampled series, gap filling with last-observation-carried-
forward, and counter rates.

All keyed-window formulations (one shuffle on the series key);
duration×value products accumulate in DECIMAL so results are exact and
partition-order-independent; divisions happen once, in IEEE double.
Ties at equal ts are totally ordered by a caller-named tiebreak column
— without it, lead/lag on duplicate timestamps is
partition-order-dependent and nothing downstream is reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    bucket_nanos: int,
    tiebreak_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Per (key, bucket) time-weighted average for irregular samples.

    Semantics: a sample holds its value from its timestamp until the
    next sample of the same key, clamped to the bucket end; the bucket
    has no value before its first sample (no back-fill across bucket
    boundaries). Among duplicate timestamps only the last (by
    tiebreak) carries duration; the rest contribute zero — exactly
    what lead() over the total order yields.

    Output: key_cols + bucket_start, twa (double), n_samples,
    covered_nanos.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    bucket = F.col(ts_col) - F.col(ts_col) % F.lit(bucket_nanos)
    bucket_end = bucket + F.lit(bucket_nanos)
    next_ts = F.lead(ts_col).over(w)
    dur = F.least(F.coalesce(next_ts, bucket_end), bucket_end) - F.col(ts_col)
    weighted = df.select(
        *key_cols,
        bucket.alias("bucket_start"),
        # decimal value x integer duration: exact, order-independent.
        # dur <= bucket_nanos fits 14 digits; keeping the product under
        # 38 total digits avoids Spark's precision-overflow rescale
        # (18,2)x(14,0) -> (33,2) exact in both Spark and DuckDB
        (
            F.col(value_col).cast("decimal(18,2)")
            * dur.cast("decimal(14,0)")
        ).alias("_wv"),
        dur.alias("_dur"),
    )
    return (
        weighted.groupBy(*key_cols, "bucket_start")
        .agg(
            F.sum("_wv").alias("_swv"),
            F.sum("_dur").alias("covered_nanos"),
            F.count("*").alias("n_samples"),
        )
        .select(
            *key_cols,
            "bucket_start",
            # rounded: the weighted sum exceeds 2^53, so the
            # decimal->double cast and the division each round — the
            # last ULP is engine-dependent; 6 decimals is reproducible
            F.round(
                F.when(
                    F.col("covered_nanos") > 0,
                    F.col("_swv").cast("double") / F.col("covered_nanos"),
                ),
                6,
            ).alias("twa"),
            "n_samples",
            "covered_nanos",
        )
    )


def gap_fill_locf(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    bucket_nanos: int,
    tiebreak_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Regularize an irregular series: one row per (key, bucket) from
    the key's first to last observed bucket; empty buckets carry the
    last observed value forward (LOCF).

    Bucket value = the key's last sample in the bucket (total order by
    ts, tiebreak). The bucket grid is generated per key with
    `sequence()` — rows scale with key spans, not with a global grid.

    Output: key_cols + bucket_start, value, filled (true when LOCF).
    """
    bucket = F.col(ts_col) - F.col(ts_col) % F.lit(bucket_nanos)
    w = Window.partitionBy(*key_cols, "bucket_start").orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    per_bucket = (
        df.select(
            *key_cols, bucket.alias("bucket_start"), ts_col, tiebreak_col,
            value_col,
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*key_cols, "bucket_start", F.col(value_col).alias("_v"))
    )
    grid = (
        per_bucket.groupBy(*key_cols)
        .agg(
            F.min("bucket_start").alias("_lo"),
            F.max("bucket_start").alias("_hi"),
        )
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(bucket_nanos))
            ).alias("bucket_start"),
        )
    )
    wfill = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("bucket_start").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [*key_cols, "bucket_start"], "left")
        .select(
            *key_cols,
            "bucket_start",
            F.last("_v", ignorenulls=True).over(wfill).alias("value"),
            F.col("_v").isNull().alias("filled"),
        )
    )


def sample_rate(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-sample rate of change: (v - prev_v) / seconds since the
    previous sample of the same key (None for each key's first sample
    and for zero-duration duplicates). The PromQL-style `rate()`
    building block for counter series.

    Output: key_cols + ts + value + rate_per_sec.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    prev_v = F.lag(value_col).over(w)
    dt = F.col(ts_col) - F.lag(ts_col).over(w)
    return df.select(
        *key_cols,
        ts_col,
        value_col,
        F.when(
            dt > 0,
            (F.col(value_col) - prev_v) / (dt / F.lit(1_000_000_000)),
        ).alias("rate_per_sec"),
    )


def ewma_rows(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    order_cols: list[str],
    window: int = 8,
    alpha: float = 0.25,
) -> DataFrame:
    """Exponentially-weighted moving average over the last `window`
    samples per key (row-lag EWMA; a time-decay half-life variant
    would swap the fixed lag weights for pow(decay, dt) — same plan).

    Engine-exact: the lag weights (1-alpha)^j are precomputed Python
    literals rounded to 9 decimals, each term rounds to 9 decimals
    before DECIMAL(28,9) accumulation, one final double division —
    the repo-wide recipe that makes float window aggregates
    hash-stable across engines and partition orders. The window is a
    KEYED lag window: per-key state, no global funnel.

    Output: input columns + ewma (round 6).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    weights = [round((1.0 - alpha) ** j, 9) for j in range(window)]
    num_terms = []
    den_terms = []
    for j, wt in enumerate(weights):
        lagged = F.lag(F.col(value_col), j).over(w)
        num_terms.append(
            F.coalesce(
                F.round(lagged * F.lit(wt), 9).cast("decimal(28,9)"),
                F.lit(0).cast("decimal(28,9)"),
            )
        )
        den_terms.append(
            F.when(lagged.isNotNull(), F.lit(wt).cast("decimal(28,9)"))
            .otherwise(F.lit(0).cast("decimal(28,9)"))
        )
    num = num_terms[0]
    for t in num_terms[1:]:
        num = num + t
    den = den_terms[0]
    for t in den_terms[1:]:
        den = den + t
    return df.withColumn(
        "ewma",
        F.round(num.cast("double") / den.cast("double"), 6),
    )
