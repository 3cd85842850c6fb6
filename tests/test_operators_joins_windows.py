"""Join and keyed-window operator tests: as-of join tie/boundary
semantics, semi/anti joins, moving range windows with duplicate
timestamps, grouped top-k, discrete quantiles."""

import pytest
from pyspark.sql import functions as F

from zikeiretsu_rs_spark.operators import joins, windows

NS = 10**9


@pytest.fixture(scope="module")
def trades_quotes(spark):
    # quotes (right): user 1 has quotes at t=10, 20, 20 (dup ts), 40
    quotes = spark.createDataFrame(
        [
            (1, 10 * NS, 101, 1.0),
            (1, 20 * NS, 102, 2.0),
            (1, 20 * NS, 103, 3.0),  # same ts as 102 — tiebreak max id wins
            (1, 40 * NS, 104, 4.0),
            (2, 50 * NS, 201, 5.0),
        ],
        ["user_id", "ts", "event_id", "px"],
    )
    # trades (left)
    trades = spark.createDataFrame(
        [
            (1, 5 * NS, 11),   # before any quote -> null
            (1, 20 * NS, 12),  # equal ts -> inclusive, max-id quote (103)
            (1, 30 * NS, 13),  # between -> quote 103
            (1, 99 * NS, 14),  # after all -> quote 104
            (2, 49 * NS, 21),  # user 2, before its quote -> null
            (3, 10 * NS, 31),  # user with no quotes -> null
        ],
        ["user_id", "ts", "trade_id"],
    )
    return trades, quotes


class TestAsofJoin:
    def test_backward_inclusive_with_ties(self, trades_quotes):
        trades, quotes = trades_quotes
        out = joins.asof_join_backward(
            trades,
            quotes,
            on=["user_id"],
            payload_cols=["event_id", "px"],
            tiebreak_col="event_id",
            prefix="q_",
        )
        got = {r["trade_id"]: (r["q_event_id"], r["q_ts"]) for r in out.collect()}
        assert got[11] == (None, None)
        assert got[12] == (103, 20 * NS)  # inclusive + max-id tiebreak
        assert got[13] == (103, 20 * NS)
        assert got[14] == (104, 40 * NS)
        assert got[21] == (None, None)
        assert got[31] == (None, None)

    def test_left_row_count_preserved(self, trades_quotes):
        trades, quotes = trades_quotes
        out = joins.asof_join_backward(
            trades, quotes, on=["user_id"], payload_cols=["px"],
            tiebreak_col="event_id",
        )
        assert out.count() == trades.count()


class TestSemiAnti:
    def test_semi_anti_partition(self, spark):
        left = spark.createDataFrame([(i,) for i in range(10)], ["k"])
        right = spark.createDataFrame([(i,) for i in range(0, 10, 2)], ["r"])
        cond = left.k == right.r
        semi = {r["k"] for r in joins.semi_join(left, right, cond).collect()}
        anti = {r["k"] for r in joins.anti_join(left, right, cond).collect()}
        assert semi == {0, 2, 4, 6, 8}
        assert anti == {1, 3, 5, 7, 9}
        assert semi | anti == set(range(10))


class TestMovingAgg:
    def test_range_window_duplicate_ts(self, spark):
        df = spark.createDataFrame(
            [
                ("a", 0 * NS, 10.0),
                ("a", 5 * NS, 20.0),
                ("a", 5 * NS, 30.0),  # duplicate ts: both rows see both
                ("a", 100 * NS, 40.0),
                ("b", 5 * NS, 1.0),
            ],
            ["k", "ts", "value"],
        )
        out = windows.moving_agg_range(df, ["k"], "value", 10 * NS)
        rows = {
            (r["k"], r["ts"], r["value"]): (r["n_win"], r["sum_win"])
            for r in out.collect()
        }
        assert rows[("a", 0, 10.0)] == (1, 10.0)
        # both dup-ts rows share the identical frame (RANGE semantics)
        assert rows[("a", 5 * NS, 20.0)] == (3, 60.0)
        assert rows[("a", 5 * NS, 30.0)] == (3, 60.0)
        # 100s is outside the 10s window of everything prior
        assert rows[("a", 100 * NS, 40.0)] == (1, 40.0)
        assert rows[("b", 5 * NS, 1.0)] == (1, 1.0)


class TestTopK:
    def test_rank_and_tiebreak(self, spark):
        df = spark.createDataFrame(
            [
                ("x", 1, 5.0),
                ("x", 2, 9.0),
                ("x", 3, 9.0),  # value tie -> lower id ranks first
                ("x", 4, 1.0),
                ("y", 5, 7.0),
            ],
            ["k", "id", "value"],
        )
        out = windows.topk_per_group(df, ["k"], "value", 2, "id")
        got = {(r["k"], r["rank"]): r["id"] for r in out.collect()}
        assert got == {("x", 1): 2, ("x", 2): 3, ("y", 1): 5}


class TestQuantiles:
    def test_discrete_order_statistics(self, spark):
        vals = [float(v) for v in [9, 1, 8, 3, 7, 5, 6, 4, 2, 10]]
        df = spark.createDataFrame([("g", v) for v in vals], ["k", "value"])
        out = windows.quantile_disc_per_group(
            df, ["k"], "value", [0.0, 0.5, 0.9, 1.0]
        ).collect()[0]
        # n=10: q0 -> rank 1 (=1.0), q50 -> rank floor(9*.5)+1=5 (=5.0),
        # q90 -> rank floor(8.1)+1=9 (=9.0), q100 -> rank 10 (=10.0)
        assert (out["q00"], out["q50"], out["q90"], out["q100"]) == (
            1.0, 5.0, 9.0, 10.0,
        )

    def test_single_element_group(self, spark):
        df = spark.createDataFrame([("g", 42.0)], ["k", "value"])
        out = windows.quantile_disc_per_group(df, ["k"], "value", [0.5]).collect()
        assert out[0]["q50"] == 42.0


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        # hot key: 90% of left rows share k=0
        left = spark.createDataFrame(
            [(0 if i % 10 else 1, i) for i in range(200)], ["k", "lv"]
        )
        right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "rv"])
        plain = joins.semi_join(left, right, left.k == right.k)  # warm path
        expect = sorted(
            map(tuple, left.join(right, "k").select("k", "lv", "rv").collect())
        )
        got = sorted(
            map(
                tuple,
                joins.salted_join(left, right, ["k"], n_salts=4)
                .select("k", "lv", "rv")
                .collect(),
            )
        )
        assert got == expect

    def test_left_join_preserves_unmatched(self, spark):
        left = spark.createDataFrame([(1, 10), (9, 90)], ["k", "lv"])
        right = spark.createDataFrame([(1, "x")], ["k", "rv"])
        out = joins.salted_join(left, right, ["k"], n_salts=3, how="left")
        got = {(r["k"], r["rv"]) for r in out.collect()}
        assert got == {(1, "x"), (9, None)}


class TestRangeJoin:
    def test_band_matches_naive(self, spark):
        import random

        from pyspark.sql import functions as F

        rng = random.Random(7)
        base = 1_700_000_000 * NS  # realistic epoch magnitude
        left = spark.createDataFrame(
            [(rng.randrange(3), base + rng.randrange(0, 1000) * NS, i)
             for i in range(60)],
            ["k", "ts", "lid"],
        )
        right = spark.createDataFrame(
            [(rng.randrange(3), base + rng.randrange(0, 1000) * NS, i)
             for i in range(60)],
            ["k", "ts", "rid"],
        )
        out = joins.range_join(left, right, ["k"], -50 * NS, 20 * NS)
        got = sorted((r["lid"], r["r_rid"]) for r in out.collect())
        naive = (
            left.join(
                right.select(
                    F.col("k"), F.col("ts").alias("rts"), "rid"
                ),
                "k",
            )
            .where(
                (F.col("rts") >= F.col("ts") - 50 * NS)
                & (F.col("rts") <= F.col("ts") + 20 * NS)
            )
        )
        expect = sorted((r["lid"], r["rid"]) for r in naive.collect())
        assert got == expect
        assert len(got) > 0

    def test_inclusive_boundaries(self, spark):
        left = spark.createDataFrame([(1, 100 * NS, 1)], ["k", "ts", "lid"])
        right = spark.createDataFrame(
            [(1, 70 * NS, 1), (1, 69 * NS, 2), (1, 100 * NS, 3),
             (1, 101 * NS, 4)],
            ["k", "ts", "rid"],
        )
        out = joins.range_join(left, right, ["k"], -30 * NS, 0)
        assert sorted(r["r_rid"] for r in out.collect()) == [1, 3]


class TestFunnel:
    def test_ordered_stages_counted(self, spark):
        from zikeiretsu_rs_spark.operators import sessionize as sz

        NS = 10**9
        rows = [
            # user 1, one session: view -> click -> purchase (full funnel)
            (1, 0 * NS, "view"), (1, 10 * NS, "click"), (1, 20 * NS, "purchase"),
            # user 2: click BEFORE view -> reaches only stage 0
            (2, 0 * NS, "click"), (2, 10 * NS, "view"),
            # user 3: view then click, no purchase -> stage 1
            (3, 0 * NS, "view"), (3, 5 * NS, "click"),
            # user 4: no view at all -> not in funnel
            (4, 0 * NS, "purchase"),
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts bigint, event_type string")
        out = {
            r["stage"]: r
            for r in sz.funnel(
                df, ["view", "click", "purchase"], gap_nanos=3600 * NS
            ).collect()
        }
        assert out["view"]["n_sessions"] == 3
        assert out["click"]["n_sessions"] == 2
        assert out["purchase"]["n_sessions"] == 1
        assert out["view"]["conversion"] == 1.0
        assert out["purchase"]["conversion"] == pytest.approx(round(1 / 3, 6))

    def test_session_gap_splits_funnel(self, spark):
        from zikeiretsu_rs_spark.operators import sessionize as sz

        NS = 10**9
        # view and purchase separated by > gap -> different sessions,
        # so the funnel does NOT credit a purchase
        rows = [(1, 0 * NS, "view"), (1, 5000 * NS, "purchase")]
        df = spark.createDataFrame(rows, "user_id bigint, ts bigint, event_type string")
        out = {
            r["stage"]: r["n_sessions"]
            for r in sz.funnel(
                df, ["view", "purchase"], gap_nanos=60 * NS
            ).collect()
        }
        assert out == {"view": 1, "purchase": 0}


class TestCohortRetention:
    def test_offsets_and_rates(self, spark):
        from zikeiretsu_rs_spark.operators import aggregates

        B = 100  # bucket width in "nanos" for the test
        rows = [
            (1, 10), (1, 110),          # cohort 0, returns offset 1
            (2, 50),                    # cohort 0, never returns
            (3, 120), (3, 350),         # cohort 100, returns offset 2
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts bigint")
        out = {
            (r["cohort_bucket"], r["bucket_offset"]): r
            for r in aggregates.cohort_retention(df, B).collect()
        }
        assert out[(0, 0)]["n_users"] == 2
        assert out[(0, 1)]["n_users"] == 1
        assert out[(0, 1)]["retention"] == 0.5
        assert out[(100, 0)]["n_users"] == 1
        assert out[(100, 2)]["retention"] == 1.0
        assert (0, 2) not in out


class TestZscoreOutliers:
    def test_flags_only_extreme_values(self, spark):
        from zikeiretsu_rs_spark.operators import aggregates

        # user 1: tight cluster around 10 plus one wild point
        rows = [(1, i, 10.0 + (i % 3) * 0.01) for i in range(20)] + [
            (1, 99, 500.0),
            (2, 0, 7.0),  # single-event user: sd == 0 -> no output
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts bigint, value double")
        out = aggregates.zscore_outliers(df, "user_id", "value").collect()
        assert [(r["user_id"], r["ts"]) for r in out] == [(1, 99)]
        assert out[0]["zscore"] > 4

    def test_constant_series_emits_nothing(self, spark):
        from zikeiretsu_rs_spark.operators import aggregates

        df = spark.createDataFrame(
            [(1, i, 5.0) for i in range(10)],
            "user_id bigint, ts bigint, value double",
        )
        assert aggregates.zscore_outliers(df, "user_id", "value").count() == 0


class TestMadOutliers:
    def test_poisoned_key_still_detected(self, spark):
        """The scenario z-scores fail on: one key has huge anomalies
        that inflate mean/std; MAD flags them anyway."""
        from zikeiretsu_rs_spark.operators import aggregates

        rows = [(1, t, 10.0 + (t % 3) * 0.5) for t in range(20)]
        rows += [(1, 100, 5000.0), (1, 101, 6000.0)]
        rows += [(2, t, 50.0) for t in range(10)]  # constant: mad 0
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        out = aggregates.mad_outliers(df, "user_id", "value", k=3.0)
        got = {(r["user_id"], r["ts"]) for r in out.collect()}
        assert (1, 100) in got and (1, 101) in got
        # constant key produces nothing (mad = 0 guard)
        assert not any(u == 2 for u, _ in got)

    def test_median_is_discrete_order_statistic(self, spark):
        from zikeiretsu_rs_spark.operators import aggregates

        # even count: disc median = element at position n/2 (4 of
        # [1,2,4,8] -> 2), never the interpolated 3.0
        rows = [(1, t, v) for t, v in enumerate([1.0, 2.0, 4.0, 8.0])]
        rows += [(1, 10, 100.0)]  # n=5, median = 4.0
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        out = aggregates.mad_outliers(df, "user_id", "value", k=1.0)
        meds = {r["med"] for r in out.collect()}
        assert meds <= {4.0}


class TestAsofForward:
    def test_earliest_following_and_ties(self, spark):
        from zikeiretsu_rs_spark.operators import joins

        left = spark.createDataFrame(
            [(1, 100, "a"), (1, 250, "b"), (2, 100, "c")],
            ["k", "ts", "tag"],
        )
        right = spark.createDataFrame(
            [(1, 100, 7, 1.0), (1, 200, 8, 2.0), (1, 200, 9, 3.0),
             (1, 300, 10, 4.0)],
            ["k", "ts", "rid", "v"],
        )
        out = {
            r["tag"]: (r["right_ts"], r["right_rid"])
            for r in joins.asof_join_forward(
                left, right, on=["k"], payload_cols=["rid"],
                tiebreak_col="rid",
            ).collect()
        }
        # equal ts IS visible forward
        assert out["a"] == (100, 7)
        # among ts-200 duplicates the SMALLEST tiebreak wins... but b
        # is at 250 so its next is 300
        assert out["b"] == (300, 10)
        # no following right row for key 2 -> NULLs survive (left join)
        assert out["c"] == (None, None)

    def test_duplicate_ts_tiebreak_is_smallest(self, spark):
        from zikeiretsu_rs_spark.operators import joins

        left = spark.createDataFrame([(1, 150, "x")], ["k", "ts", "tag"])
        right = spark.createDataFrame(
            [(1, 200, 9, 1.0), (1, 200, 8, 2.0)], ["k", "ts", "rid", "v"]
        )
        r = joins.asof_join_forward(
            left, right, on=["k"], payload_cols=["rid"], tiebreak_col="rid"
        ).collect()[0]
        assert (r["right_ts"], r["right_rid"]) == (200, 8)


class TestBloomFilteredJoin:
    """Bloom prefilter transparency: identical result to the plain
    join (no false negatives; exact join removes false positives),
    and the prefilter actually prunes."""

    def test_equals_plain_join(self, spark):
        from zikeiretsu_rs_spark.operators.joins import bloom_filtered_join

        big = spark.range(0, 2000).select(
            (F.col("id") % 500).alias("k"), F.col("id").alias("v")
        )
        small = spark.createDataFrame(
            [(3,), (77,), (499,), (1000,)], ["sk"]
        )
        got = bloom_filtered_join(big, "k", small, "sk", n_bits=1 << 10, k=4)
        plain = big.join(small, big.k == small.sk)
        key = lambda df: sorted((r["k"], r["v"]) for r in df.collect())
        assert key(got) == key(plain)
        assert got.count() == 12  # 3 matching keys x 4 rows each

    def test_prefilter_prunes(self, spark):
        from zikeiretsu_rs_spark.operators.joins import bloom_filtered_join

        n_bits, k = 1 << 10, 4
        small = spark.createDataFrame([(7,), (11,)], ["sk"])
        # a disjoint key range must yield zero rows (exact join removes
        # any false-positive survivors), and the PREFILTER itself must
        # pass only a small fraction: with 8 set bits of 1024, the
        # 4-probe all-hit rate is ~(8/1024)^4 — effectively zero
        big = spark.range(10_000, 20_000).select(F.col("id").alias("k"))
        out = bloom_filtered_join(big, "k", small, "sk", n_bits=n_bits, k=k)
        assert out.count() == 0  # exact join removes any FP survivors

    def test_high_bit_words_survive_two_complement(self, spark):
        from zikeiretsu_rs_spark.operators.joins import bloom_filtered_join

        # enough keys that some bitmap word has bit 63 set (2048 keys
        # over 1<<14 bits: ~50% of bits set) — the signed-long
        # conversion must keep membership tests exact
        small = spark.range(0, 2048).select(F.col("id").alias("sk"))
        big = spark.range(0, 4096).select(F.col("id").alias("k"))
        got = bloom_filtered_join(big, "k", small, "sk", n_bits=1 << 14, k=3)
        assert got.count() == 2048  # every true key found
