"""Z-order (Morton-curve) multi-dimensional clustering — the lakehouse
layout for queries that filter on MORE than the primary sort key.

The warehouse's `dt=`-partitioned, ts-sorted layout makes time-range
predicates cheap (partition pruning + row-group min/max skipping), but
a query filtering on (user_id AND ts) still scans every row group of
the surviving time window: sorted-by-ts files have arbitrary user_id
min/max per row group. Interleaving the bits of both normalized
dimensions and sorting by that Morton code clusters rows so EVERY
participating column has tight per-row-group statistics — Parquet's
existing min/max skipping then prunes on all of them at once, no
custom index. This is the same technique Delta Lake's OPTIMIZE ZORDER
and Iceberg's sort orders apply; here it is a pure column expression
plus a sorted write.

Everything is JVM-side Catalyst arithmetic (shifts/masks over a
`bits`-wide normalization), no UDFs; the normalization min/max come
from a 1-row aggregate (broadcast-scale driver state, the same
sanction as the limit thresholds).

Caveats, documented for honesty: Z-values interleave RANK-scaled
values, so clustering quality degrades when one dimension's
distribution is extremely skewed (use fewer bits for the skewed dim or
hash it first); and the curve trades a little per-dimension locality
for multi-dimension locality — a pure single-key workload should stay
on the plain sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Affine-scale a numeric column into [0, 2^bits) as a long.
    Constant columns (cmax == cmin) scale to 0."""
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    top = F.lit((1 << bits) - 1)
    return F.least(top, F.floor(frac * (1 << bits)).cast("long"))


def zorder_value(scaled: list[Column], bits: int = 16) -> Column:
    """Morton code of already-[0, 2^bits)-scaled long columns: bit i of
    dimension d lands at position i * n_dims + d. Pure shift/mask
    expression tree (n_dims * bits terms, JVM-side)."""
    n = len(scaled)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(scaled):
            out = out + (
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    return out


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write `df` clustered by the Z-order of `cols`: range-partition
    on the Morton code into `n_files` files, sort within each — every
    row group gets tight min/max on ALL participating columns. The
    min/max normalization constants come from one 1-row aggregate."""
    stats = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scale_to_bits(
            F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
        )
        for c in cols
    ]
    z = zorder_value(scaled, bits).alias("_z")
    (
        with_stats.select(*df.columns, z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
