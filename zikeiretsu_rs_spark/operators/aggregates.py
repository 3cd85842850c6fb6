"""Time-bucket aggregation operators (north-star extension surface,
SURVEY.md §7.2 step 7 — the reference dialect has no aggregations,
§2.7).

Scale notes: one hash-shuffle on (bucket, keys) with map-side partial
aggregation; bucket arithmetic is pure integer math on the nano spine
(whole-stage codegen, no UDF). Double sums go through DECIMAL
accumulation so results are order-independent — at 100 TB a
floating-point sum is nondeterministic across retries/partitionings,
which breaks both testing and incremental rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANOS_PER_SEC = 1_000_000_000


def time_bucket(
    df: DataFrame,
    bucket_width_nanos: int,
    group_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window aggregate over the nano timestamp spine.

    Output: bucket_start (nanos), *group_cols, n (count),
    sum_value (exact via decimal), avg_value (sum/n as double).
    """
    bucket = (F.col(ts_col) - F.col(ts_col) % F.lit(bucket_width_nanos)).alias(
        "bucket_start"
    )
    dec = F.col(value_col).cast("decimal(18,2)")
    out = (
        df.groupBy(bucket, *[F.col(c) for c in group_cols])
        .agg(
            F.count("*").alias("n"),
            F.sum(dec).alias("_sum_dec"),
        )
        .withColumn("sum_value", F.col("_sum_dec").cast("double"))
        # double / long, NOT decimal / long: decimal-division scale rules
        # are engine-specific, double division is IEEE-deterministic
        .withColumn("avg_value", F.col("_sum_dec").cast("double") / F.col("n"))
        .drop("_sum_dec")
    )
    return out


def value_share_by_key(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key share of total: count + exact decimal sum + share of the
    global total (one extra 1-row broadcast, no global window)."""
    dec = F.col(value_col).cast("decimal(18,2)")
    per_key = df.groupBy(key_col).agg(
        F.count("*").alias("n"), F.sum(dec).alias("_sum_dec")
    )
    total = per_key.agg(F.sum("_sum_dec").alias("_total"))
    return (
        per_key.join(F.broadcast(total))
        .withColumn("sum_value", F.col("_sum_dec").cast("double"))
        .withColumn(
            "share",
            F.col("_sum_dec").cast("double") / F.col("_total").cast("double"),
        )
        .drop("_sum_dec", "_total")
    )


def cohort_retention(
    df: DataFrame,
    bucket_nanos: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity time
    bucket (the cohort), counted in every later bucket they return in.

    Scale shape: one distinct (user, bucket) reduction (map-side
    combined), one per-user min for the cohort (window over the same
    key — no self-join), then a (cohort, offset) count. All shuffles
    keyed; nothing quadratic; no driver state.

    Output: cohort_bucket (nanos), bucket_offset (0 = the cohort
    bucket itself), n_users, retention (vs offset 0 of the same
    cohort, round 6).
    """
    from pyspark.sql import Window

    active = df.select(
        F.col(user_col),
        (F.col(ts_col) - F.col(ts_col) % F.lit(bucket_nanos)).alias("_bucket"),
    ).distinct()
    w = Window.partitionBy(user_col)
    with_cohort = active.withColumn("_cohort", F.min("_bucket").over(w))
    counts = (
        with_cohort.groupBy("_cohort", "_bucket")
        .agg(F.count("*").alias("n_users"))
        .select(
            F.col("_cohort").alias("cohort_bucket"),
            ((F.col("_bucket") - F.col("_cohort")) / F.lit(bucket_nanos))
            .cast("long")
            .alias("bucket_offset"),
            "n_users",
        )
    )
    base = Window.partitionBy("cohort_bucket")
    return counts.withColumn(
        "retention",
        F.round(
            F.col("n_users")
            / F.sum(
                F.when(F.col("bucket_offset") == 0, F.col("n_users"))
            ).over(base),
            6,
        ),
    )


def zscore_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    z: float = 3.0,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key z-score anomaly detection: rows whose value deviates
    more than `z` population standard deviations from their key's
    mean. Moments come from DECIMAL-exact sums over a keyed window
    (sum and sum-of-squares are exact, so mean/std are identical
    doubles on any engine or partitioning — a float running sum would
    make the outlier SET partition-order-dependent at the margin).
    Keys with zero variance emit nothing.

    Output: key, ts, value, zscore (round 6).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col)
    dec = F.col(value_col).cast("decimal(18,2)")
    s = F.sum(dec).over(w)
    sq = F.sum(dec * dec).over(w)
    n = F.count("*").over(w)
    mu = s.cast("double") / n
    sd = F.sqrt(sq.cast("double") / n - mu * mu)
    scored = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        mu.alias("_mu"),
        sd.alias("_sd"),
    )
    return (
        scored.where(
            (F.col("_sd") > 0)
            & (F.abs(F.col(value_col) - F.col("_mu")) > F.lit(z) * F.col("_sd"))
        )
        .select(
            key_col,
            ts_col,
            value_col,
            F.round(
                (F.col(value_col) - F.col("_mu")) / F.col("_sd"), 6
            ).alias("zscore"),
        )
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key robust (median/MAD) anomaly detection — the outlier
    detector that heavy outliers cannot poison: z-scores inflate the
    mean and std with the very anomalies being hunted; the median and
    the median absolute deviation have a 50% breakdown point.

    Both medians are DISCRETE (type-1) order statistics — the value at
    floor((n-1)/2)+1 of the ascending (value, ts) sort — so no
    interpolation arithmetic exists to differ between engines: the
    outlier SET is bit-reproducible (same recipe as
    `windows.quantile_disc_per_group`). Two keyed sort windows, no
    joins; flags |x - med| > k * 1.4826 * mad (the Gaussian-consistent
    MAD scale factor).

    Output: key, ts, value, med, mad, robust_z (round 6) for flagged
    rows; keys with mad = 0 yield no rows (degenerate distribution).
    """
    from pyspark.sql import Window

    def disc_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(key_col).orderBy(
            F.col(col).asc(), F.col(ts_col).asc()
        )
        wk = Window.partitionBy(key_col)
        return (
            frame.withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count("*").over(wk))
            .withColumn(
                out,
                F.max(
                    F.when(
                        F.col("_rn")
                        == F.floor((F.col("_n") - 1) / 2) + 1,
                        F.col(col),
                    )
                ).over(wk),
            )
            .drop("_rn", "_n")
        )

    with_med = disc_median(
        df.select(key_col, ts_col, value_col), value_col, "med"
    ).withColumn("_absdev", F.abs(F.col(value_col) - F.col("med")))
    with_mad = disc_median(with_med, "_absdev", "mad").drop("_absdev")
    return (
        with_mad.where(
            (F.col("mad") > 0)
            & (
                F.abs(F.col(value_col) - F.col("med"))
                > F.lit(k) * F.lit(1.4826) * F.col("mad")
            )
        )
        .select(
            key_col,
            ts_col,
            value_col,
            "med",
            "mad",
            F.round(
                (F.col(value_col) - F.col("med"))
                / (F.lit(1.4826) * F.col("mad")),
                6,
            ).alias("robust_z"),
        )
    )
