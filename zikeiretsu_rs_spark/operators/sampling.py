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

from pyspark.sql import Column, DataFrame, Window
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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
    prefilter_overselect: float | None = None,
) -> DataFrame:
    """Exact per-stratum quota sampling — the training-mixture
    primitive ("N docs from web, M from wiki, ..."). Rows in each
    stratum are ranked by content hash (md5 of the key, tie-broken by
    the key) and the first `quota` kept, so the selected set is a pure
    function of content: reproducible across engines, partitionings and
    reruns, and monotone under quota increase (raising a quota only
    ADDS rows — the mix can be grown without churning what was already
    sampled). Strata not in `quotas` get `default_quota`; a stratum
    smaller than its quota is kept whole.

    Output: the input columns plus `rnk` (1-based position in the
    stratum's hash order — stable shard/curriculum key).

    Scale path: `prefilter_overselect=k` first drops every row whose
    32-bit hash prefix is above ~k*quota/|stratum| of the hash space,
    so the per-stratum sort ranks ~k*quota rows instead of the whole
    stratum (the same threshold-before-rank shape as the L4 limit
    pushdown). Because hash32-prefix order is a coarsening of the full
    md5 order, the top-`quota` rows are ALWAYS inside the surviving
    prefix when enough rows survive; strata where the overselect was
    too tight (possible only for tiny k) are detected by count and
    re-ranked exactly, so the result is identical to the exact path —
    verified in tests."""
    strata, key = F.col(strata_col), F.col(key_col)
    spark = df.sparkSession
    quota_rows = [(s, int(n)) for s, n in quotas.items()]
    quota_df = F.broadcast(
        spark.createDataFrame(quota_rows, f"{strata_col} string, __quota int")
    )
    with_quota = (
        df.join(quota_df, on=strata_col, how="left")
        .withColumn("__quota", F.coalesce("__quota", F.lit(int(default_quota))))
        .where(F.col("__quota") > 0)
    )
    order = [F.md5(key.cast("string")).asc(), key.asc()]

    def rank_and_keep(candidates: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        w = Window.partitionBy(strata).orderBy(*order)
        return (
            candidates.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= F.col("__quota"))
            .drop("__quota")
        )

    if prefilter_overselect is None:
        return rank_and_keep(with_quota)

    # -- scale path: hash32 threshold, then rank only the survivors ----
    counts = with_quota.groupBy(strata_col, "__quota").agg(
        F.count("*").alias("__cnt")
    )
    pre = with_quota.join(
        F.broadcast(counts.drop("__quota")), on=strata_col
    )
    hash32 = F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("long")
    threshold = F.least(
        F.lit(float(2**32)),
        F.lit(float(prefilter_overselect) * 2**32)
        * F.col("__quota")
        / F.col("__cnt"),
    )
    # the survivor set is REDUCED (~overselect×quota rows per stratum)
    # and feeds two consumers — the sufficiency count below and the
    # rank itself — which would otherwise each re-scan the corpus and
    # re-apply the threshold; the eager checkpoint makes the corpus
    # scan run once (optimization round 14 — the checkpoint-the-
    # reduced-intermediate rule; the deficient-strata collect right
    # after forces materialization at build time anyway)
    survivors = (
        pre.where(hash32 < threshold).drop("__cnt").localCheckpoint()
    )
    # sufficiency: a stratum is safe iff survivors >= min(quota, cnt);
    # left join from the counts side so a stratum with ZERO survivors
    # still shows up as deficient
    kept = survivors.groupBy(strata_col).agg(F.count("*").alias("__kept"))
    per_stratum = (
        counts.join(kept, on=strata_col, how="left")
        .select(
            strata_col,
            (
                F.coalesce("__kept", F.lit(0))
                >= F.least(F.col("__quota"), F.col("__cnt"))
            ).alias("__ok"),
        )
    )
    deficient = [
        r[strata_col] for r in per_stratum.where(~F.col("__ok")).collect()
    ]  # bounded by the (small) number of strata, like IVF's centroid pull
    safe = rank_and_keep(survivors.where(~strata.isin(deficient)))
    if not deficient:
        return safe
    rescue = rank_and_keep(with_quota.where(strata.isin(deficient)))
    return safe.unionByName(rescue)


def quality_weighted_sample(
    df: DataFrame,
    key_col: str,
    quality_col: str,
) -> DataFrame:
    """Importance sampling by a per-row quality score in [0, 1]: row
    acceptance probability = floor(quality * 256) / 256, decided by the
    same content-hash bucket as `deterministic_sample` — so the sample
    is reproducible on any engine/partitioning AND biased toward
    high-quality rows (the quality-weighted mixing step of a training
    pipeline; cf. the sampling weights of DoReMi/DataComp-style
    curation). Kept rows carry `weight` = 1/p (Horvitz-Thompson
    inverse-probability weight), so downstream token counts and loss
    statistics stay unbiased estimates of the full corpus.

    quality == 0 rows (threshold 0) can never be kept; map-side only —
    no shuffle, no UDF.

    Output: key, quality, weight (round 6).
    """
    thr = F.floor(F.col(quality_col) * 256).cast("int")
    kept = df.select(F.col(key_col), F.col(quality_col)).where(
        _bucket256(F.col(key_col)) < thr
    )
    return kept.withColumn(
        "weight", F.round(F.lit(256.0) / thr.cast("double"), 6)
    )


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


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    test_256: int = 26,
    valid_256: int = 26,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Train/valid/test assignment that never separates near-
    duplicates: rows are grouped into connected components of the
    near-dup pair graph and the WHOLE cluster is bucketed by the hash
    of its cluster id (min reachable id), so two near-identical
    documents can never land on opposite sides of a train/eval
    boundary — the split-leakage failure mode hash-splitting alone
    cannot prevent (near-dups have different content hashes).

    `pairs` is any (id_a, id_b) near-dup pair source — at scale, the
    banded MinHash candidates re-scored exactly (linear), exactly as
    `dedup_clusters_scaled` runs it. Singleton documents (no pairs)
    form their own cluster and bucket by their own id, which degrades
    to plain `train_test_split` when the graph is empty.

    Output: input columns + cluster_id + split.
    """
    from .dedup import connected_components

    clusters = connected_components(pairs, id_a, id_b)
    out = (
        df.join(clusters, df[id_col] == clusters["node"], "left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
        )
        .drop("node")
    )
    return train_test_split(out, "cluster_id", test_256, valid_256)


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Priority ("sequential Poisson") weighted sampling without
    replacement (Ohlsson; Duffield-Lund-Thorup): each row gets
    priority = u / w where u is its content-hash uniform in (0, 1],
    and the k SMALLEST priorities are kept. Inclusion probability is
    ~proportional to weight, and the sample is a pure function of
    content (u = md5-derived — engine/partitioning/rerun-stable, no
    RNG state).

    Scale shape: the boundary row comes from `orderBy(...).limit(k+1)`
    — Spark compiles that to TakeOrderedAndProject (per-partition
    top-(k+1), merged once), NOT a global sort; the kept set is then a
    scalar-threshold filter against the broadcast boundary, the same
    shape as the distinct-ts limits. No un-keyed window anywhere.

    The Duffield-Lund-Thorup estimator rides along: with tau = the
    (k+1)-th smallest priority, qhat = max(w, 1/tau) makes sum(qhat)
    an unbiased estimate of the population weight from the sample
    alone (qhat = w when the corpus has <= k rows: the sample is a
    census).

    Output: the k sampled rows + priority (round 9) + qhat (round 6).
    """
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**32))  # (0, 1]
    w = F.col(weight_col).cast("double")
    withp = df.withColumn("_pri", u / w)
    # distributed top-(k+1) by (priority, key) — total order, no ties
    boundary = (
        withp.select("_pri", F.col(key_col).alias("_bkey"))
        .orderBy(F.col("_pri").asc(), F.col("_bkey").asc())
        .limit(k + 1)
        .agg(
            F.max(F.struct("_pri", "_bkey")).alias("_b"),
            F.count("*").alias("_n"),
        )
        .select(
            F.col("_b._pri").alias("_tau"),
            F.col("_b._bkey").alias("_tkey"),
            F.col("_n").alias("_n"),
        )
    )
    joined = withp.crossJoin(F.broadcast(boundary))
    kept = joined.where(
        # fewer than k+1 rows total -> census (keep everything);
        # otherwise strictly below the boundary row in (pri, key) order
        (F.col("_n") < k + 1)
        | (F.col("_pri") < F.col("_tau"))
        | ((F.col("_pri") == F.col("_tau")) & (F.col(key_col) < F.col("_tkey")))
    )
    return kept.select(
        *df.columns,
        F.round("_pri", 9).alias("priority"),
        F.round(
            F.when(F.col("_n") < k + 1, w).otherwise(
                F.greatest(w, F.lit(1.0) / F.col("_tau"))
            ),
            6,
        ).alias("qhat"),
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    k: int,
) -> DataFrame:
    """Per-key contribution cap — keep at most `k` rows per key in a
    deterministic (order_cols) total order. The anti-dominance
    primitive of user-generated corpora: without it, one prolific
    user/domain floods its slice of the training mix (the per-entity
    dedup/cap rule most pipelines apply before mixing).

    Scale shape: one keyed window (row_number over the key) — no
    global ordering, parallel by key; a hot key costs O(its rows),
    bounded output k per key.

    Output: the input columns, capped.
    """
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
