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


def space_saving_summary(
    df: DataFrame, item_col: str, capacity: int = 64
) -> DataFrame:
    """Distributed Misra-Gries (Space-Saving-family) heavy-hitter
    summary with BOUNDED state — the 100 TB answer to "top items by
    frequency" when the item universe itself is too large to shuffle.

    Per input partition, an MG summary of at most `capacity` counters
    is maintained with the mergeable-summaries batch rule (Agarwal et
    al., "Mergeable Summaries", PODS'12): each Arrow batch is reduced
    to exact value_counts (vectorized), merged into the summary, and
    if the summary exceeds capacity the (capacity+1)-th largest count
    is subtracted from every counter and non-positive counters drop —
    accumulating that subtraction in the partition's error `pdelta`.
    Invariants (theorems, any partitioning / any order):

      est(i) <= true(i) <= est(i) + sum_p pdelta_p
      true(i) >  sum_p pdelta_p  =>  i is present in the summary

    with sum_p pdelta_p <= n / (capacity + 1).

    Output: one row per tracked (partition, item) with its partial
    `est` plus one NULL-item row per partition carrying `pdelta`.
    Row count is <= n_partitions * (capacity + 1) — merge-side state
    is independent of both corpus size and item cardinality.
    """
    import pandas as pd

    def mg_partition(batches):
        counters: dict = {}
        delta = 0
        for pdf in batches:
            vc = pdf[item_col].dropna().value_counts()
            for item, cnt in vc.items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                delta += cut
                counters = {
                    k: v - cut for k, v in counters.items() if v > cut
                }
        items = list(counters)
        yield pd.DataFrame(
            {
                "item": items + [None],
                "est": [counters[i] for i in items] + [0],
                "pdelta": [0] * len(items) + [delta],
            }
        )

    src = df.select(F.col(item_col).cast("string").alias(item_col))
    return src.mapInPandas(
        mg_partition, schema="item string, est bigint, pdelta bigint"
    )


def heavy_hitters(
    df: DataFrame, item_col: str, capacity: int = 64
) -> DataFrame:
    """Merged global heavy-hitter estimates from the per-partition
    summaries: item, est (lower bound on true count), err_bound (the
    global MG error: true count <= est + err_bound; any item whose
    true count exceeds err_bound is guaranteed present).

    The merge aggregates <= n_partitions * (capacity + 1) summary rows
    — a broadcast-scale relation regardless of corpus size."""
    s = space_saving_summary(df, item_col, capacity)
    delta_total = s.agg(F.sum("pdelta").alias("err_bound"))
    merged = (
        s.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )
    return merged.crossJoin(F.broadcast(delta_total))


def cms_build(
    df: DataFrame,
    item_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) as a
    sparse (row, bucket, cnt) relation — at most depth*width rows of
    state no matter the corpus or item cardinality, and MERGEABLE:
    sketches of shards add cell-wise (`cms_merge`), so daily sketches
    roll up without re-scanning history.

    Scale shape: the item stream is reduced to exact per-item counts
    FIRST (one map-side-combined groupBy — the only corpus-sized
    step); the depth-way explode happens on the distinct-item table,
    not the stream. Hash row j of item x is md5-arithmetic
    (`conv(substr(md5('cms{j}:'||x),1,8),16,10) % width`) — pure
    engine-portable expressions, so an oracle can rebuild every cell
    exactly.

    Output: j (0..depth-1), bucket (0..width-1), cnt.
    """
    if weight_col is None:
        counts = df.groupBy(F.col(item_col).cast("string").alias("item")).agg(
            F.count("*").alias("w")
        )
    else:
        counts = df.groupBy(F.col(item_col).cast("string").alias("item")).agg(
            F.sum(weight_col).alias("w")
        )
    rows = counts.select(
        "item", "w", F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("j")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("item"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    return (
        rows.select("j", bucket.alias("bucket"), "w")
        .groupBy("j", "bucket")
        .agg(F.sum("w").cast("long").alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge CMS sketches built with the same (depth, width): cells
    add. Input/output schema: j, bucket, cnt."""
    return sketches.groupBy("j", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame, items: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for each row of `items`: est(x) =
    min_j cell[j][h_j(x)] — the one-sided CMS guarantee
    (est >= true always; est <= true + N/width per row in
    expectation). `items` is expected to be small (a candidate or
    report set) and is broadcast into the depth-way expansion; the
    sketch side is at most depth*width rows.

    Internal columns are `_cms_`-prefixed and a synthetic row id is
    attached BEFORE the depth-way explode, so caller columns named
    item/j/bucket/cnt are never clobbered or made ambiguous, and
    duplicate probe rows each get their own estimate instead of
    silently collapsing in the final group-back.

    Output: items' columns + cms_est (row order not preserved;
    duplicates preserved).
    """
    probes = (
        items.withColumn("_cms_rid", F.monotonically_increasing_id())
        .withColumn("_cms_item", F.col(item_col).cast("string"))
        .withColumn("_cms_j", F.explode(F.expr(f"sequence(0, {depth - 1})")))
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        F.col("_cms_j").cast("string"),
                        F.lit(":"),
                        F.col("_cms_item"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    probes = probes.withColumn("_cms_bucket", bucket)
    sketch = F.broadcast(
        cms.select(
            F.col("j").alias("_cms_j"),
            F.col("bucket").alias("_cms_bucket"),
            F.col("cnt").alias("_cms_cnt"),
        )
    )
    joined = probes.join(sketch, ["_cms_j", "_cms_bucket"], "left").withColumn(
        "_cms_cell", F.coalesce(F.col("_cms_cnt"), F.lit(0))
    )
    out_cols = [c for c in items.columns]
    return (
        joined.groupBy("_cms_rid", *out_cols)
        .agg(F.min("_cms_cell").cast("long").alias("cms_est"))
        .drop("_cms_rid")
    )
