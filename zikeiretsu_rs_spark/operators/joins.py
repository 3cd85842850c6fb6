"""Time-series join operators (north-star extension surface — the
reference has no joins of any kind, SURVEY.md §2.8; these are the join
shapes a large-scale event/training-data pipeline needs).

Scale notes:

- `asof_join_backward` uses the union-and-scan formulation, NOT a range
  join: tag both sides, union, one keyed window pass carrying the last
  right-side row forward as a struct. Cost = one shuffle on the join
  key + a per-key sorted scan — linear, no range-join row explosion,
  no broadcast requirement on either side. This is the as-of
  formulation that survives two 100 TB inputs (a range join's
  candidate set is quadratic in rows-per-key; a broadcast as-of caps
  the right side at driver memory).
- semi/anti joins use Spark's native `left_semi` / `left_anti` so
  Catalyst picks broadcast/shuffled-hash variants and AQE can convert
  at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    payload_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    prefix: str = "right_",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    `right.ts <= left.ts` and equal join keys (backward inclusive
    as-of; left-join semantics — unmatched left rows keep NULLs).

    Deterministic tie rules: at equal ts the right row IS visible to
    the left row; among multiple right rows at the same (keys, ts) the
    greatest `tiebreak_col` wins (pass one whenever the right side can
    have duplicate timestamps per key — without it the winner is
    partition-order-dependent).

    Output: `on` + ts + remaining left columns + `{prefix}{ts_col}` +
    `{prefix}{c}` for each payload column.
    """
    left_extra = [c for c in left.columns if c not in on and c != ts_col]
    ltypes = dict(left.dtypes)

    r_struct = F.struct(
        F.col(ts_col).alias(ts_col),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0))
        .cast("long")
        .alias("_tb"),
        r_struct.alias("_r"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_extra],
    )
    r_struct_ddl = r.schema["_r"].dataType.simpleString()
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast(r_struct_ddl).alias("_r"),
        *left_extra,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_side") == 1).select(
        *on,
        ts_col,
        *left_extra,
        F.col(f"_m.{ts_col}").alias(f"{prefix}{ts_col}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    payload_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    prefix: str = "right_",
) -> DataFrame:
    """Forward (look-ahead) as-of join: for every left row, attach the
    EARLIEST right row with `right.ts >= left.ts` and equal keys —
    the mirror of `asof_join_backward` ("what was the next quote /
    event after this point"). Same union-and-scan single keyed window,
    reversed direction: descending ts with an unbounded-preceding
    `last(ignorenulls)` carries the nearest following right row.

    Tie rules mirror backward: at equal ts the right row IS visible;
    among right duplicates at the same (keys, ts) the SMALLEST
    `tiebreak_col` wins (the "first" following row — deterministic).

    Output: `on` + ts + remaining left columns + `{prefix}{ts_col}` +
    `{prefix}{c}` for each payload column.
    """
    left_extra = [c for c in left.columns if c not in on and c != ts_col]
    ltypes = dict(left.dtypes)

    r_struct = F.struct(
        F.col(ts_col).alias(ts_col),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0))
        .cast("long")
        .alias("_tb"),
        r_struct.alias("_r"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_extra],
    )
    r_struct_ddl = r.schema["_r"].dataType.simpleString()
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast(r_struct_ddl).alias("_r"),
        *left_extra,
    )
    # descending scan: right rows sort before left rows at equal ts
    # (visible), and among equal-ts right rows the LARGEST _tb comes
    # first so the smallest one is carried last -> wins
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).desc(), F.col("_side").asc(), F.col("_tb").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_side") == 1).select(
        *on,
        ts_col,
        *left_extra,
        F.col(f"_m.{ts_col}").alias(f"{prefix}{ts_col}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )


def semi_join(left: DataFrame, right: DataFrame, condition) -> DataFrame:
    """EXISTS semi-join: left rows with >=1 match (native left_semi —
    broadcast/AQE-eligible, output never exceeds the left side)."""
    return left.join(right, condition, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, condition) -> DataFrame:
    """NOT EXISTS anti-join: left rows with no match."""
    return left.join(right, condition, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key mitigation for shuffle joins when AQE's skew splitting
    isn't enough (a single key's rows exceed what one task can hold
    and the right side is too big to broadcast): the left side gets a
    deterministic per-row salt (hash of the whole row, stable across
    retries), the right side is replicated across all `n_salts` salt
    values, and the join key becomes (keys..., salt) — the hot key's
    rows spread over n_salts tasks at the cost of an n_salts-times
    replicated right side. Only worth it when |right| * n_salts is
    still far below the hot key's row count.
    """
    l = left.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)
        ).cast("int"),
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [*on, "_salt"], how).drop("_salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    lower_nanos: int,
    upper_nanos: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """Band/interval join: pair every left row with the right rows of
    the same key whose timestamp lies in
    `[left.ts + lower_nanos, left.ts + upper_nanos]` (inclusive).

    Scale shape: a naive `l.join(r, r.ts BETWEEN ...)` degenerates to a
    per-key nested loop (the range predicate can't hash). Instead both
    sides are bucketized by the band width W = upper - lower: a right
    row lands in one bucket; a left row's band spans at most two
    buckets, so the left side explodes to exactly 2 rows and the join
    is a plain equi-join on (keys..., bucket) — candidate cost is
    2x|left| + the true matches, independent of key skew in time. The
    exact band predicate filters after.

    Output: all left columns + right ts/other columns prefixed.
    """
    width = upper_nanos - lower_nanos
    if width <= 0:
        raise ValueError("upper_nanos must exceed lower_nanos")
    # integer `div`, NOT floor(x / w): the double division loses
    # precision above 2^53 and mis-buckets epoch-nano boundaries
    l = left.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.expr(f"({left_ts} + {lower_nanos}L) div {width}L"),
                F.expr(f"({left_ts} + {upper_nanos}L) div {width}L"),
            )
        ),
    )
    right_cols = [c for c in right.columns if c not in on]
    r = right.select(
        *on,
        F.expr(f"{right_ts} div {width}L").alias("_bk"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right_cols],
    )
    rts = f"{right_prefix}{right_ts}"
    return (
        l.join(r, [*on, "_bk"])
        .where(
            (F.col(rts) >= F.col(left_ts) + F.lit(lower_nanos))
            & (F.col(rts) <= F.col(left_ts) + F.lit(upper_nanos))
        )
        .drop("_bk")
    )


def bloom_prefilter(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    n_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """The map-side half of `bloom_filtered_join`: big-side rows whose
    key passes every probe of the small side's bitmap (all true
    matches plus <1% false positives). Exposed so callers — and the
    bench — can measure what reaches the join exchange. This is the
    manual form of Spark's runtime-filter pushdown, kept explicit so
    selectivity and bitmap size are controllable and testable.

    Scale shape: the small side's set BIT POSITIONS are computed by
    Spark itself (one tiny job: distinct keys × k xxhash64 probes —
    the same driver bound as any broadcast dim; this operator is for
    big⋈small joins) and folded into an n_bits bitmap shipped as ONE
    array<long> literal of n_bits/64 words (16 KiB at the default —
    plan-sized, not data-sized). The probe side evaluates the SAME
    xxhash64 expressions (JVM codegen, no UDF, and xxhash64 is far
    cheaper per row than a cryptographic hash); because both sides
    run the identical Spark expression, no Python reimplementation of
    the hash exists to drift. At k=5 and n_bits/|keys| >= 16 the
    false-positive rate is < 1%, so ~99% of non-matching big-side
    rows never reach the join's exchange.
    """

    def pos_expr(j: int, key_col: str) -> str:
        return (
            f"pmod(xxhash64(concat('bf{j}:', cast({key_col} as string))), "
            f"{n_bits})"
        )

    pos_cols = [
        F.expr(pos_expr(j, small_key)).alias(f"_p{j}") for j in range(k)
    ]
    words = [0] * (n_bits // 64)
    for row in small.select(*pos_cols).distinct().collect():
        for j in range(k):
            h = row[f"_p{j}"]
            words[h // 64] |= 1 << (h % 64)
    # two's-complement into signed 64-bit Spark longs
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    test = None
    for j in range(k):
        pos = pos_expr(j, big_key)
        cond = F.expr(
            f"(element_at(_bm, cast(({pos}) div 64 as int) + 1) & "
            f"shiftleft(1L, cast(({pos}) % 64 as int))) != 0"
        )
        test = cond if test is None else (test & cond)

    # the bitmap ships as ONE SQL array(...) literal parsed server-side:
    # `F.lit(list)` builds the same literal through one py4j round trip
    # PER ELEMENT — measured 1.1 s of pure driver time for the default
    # 2048 words vs 0.003 s for the single parsed string (optimization
    # round 14). Same Literal node in the plan either way.
    bitmap = F.expr(
        "array(" + ",".join(f"{w}L" for w in words) + ")"
    )
    return big.withColumn("_bm", bitmap).where(test).drop("_bm")


def bloom_filtered_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    n_bits: int = 1 << 17,
    k: int = 5,
    broadcast_small: bool = True,
) -> DataFrame:
    """Inner join with a broadcast Bloom-filter pre-pass: the big side
    is pruned MAP-SIDE (`bloom_prefilter` — see its docstring for the
    mechanism and scale shape), then the surviving rows take the exact
    join, which removes the false positives; a Bloom filter has no
    false negatives, so the result is IDENTICAL to the plain join
    (oracle-gated). `broadcast_small=False` lets Catalyst/AQE pick the
    join strategy — the prefilter's win is strategy-independent (it
    shrinks what reaches the exchange), and the bench measures it
    under a forced shuffle join to model the 100 TB
    both-sides-exchange case.

    Break-even, MEASURED (bench skew section, sf0.1, forced shuffle,
    build side one part brand): the bitmap-build job is a flat
    ~1.2-1.5 s; at the 600k-row fact it loses (0.15 vs 1.3 s), at a
    16x-widened fact (9.6M rows) it crosses over (2.5 vs 2.2 s), and
    at 64x (38.4M rows) it wins 3.8x (8.9 vs 2.3 s). Recommendation:
    leave it off below ~5M pruned-side rows per brand-sized build
    set, on above — which at 100 TB is always on when the filter
    prunes meaningfully (here 96%+ of rows never reach the
    exchange)."""
    filtered = bloom_prefilter(big, big_key, small, small_key, n_bits, k)
    rhs = F.broadcast(small) if broadcast_small else small
    return filtered.join(
        rhs, filtered[big_key] == small[small_key], "inner"
    )
