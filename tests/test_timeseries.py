"""Time-series analytics operators: hand-computed TWA, LOCF gap fill,
and rate cases, including duplicate-timestamp determinism."""

from zikeiretsu_rs_spark.operators import timeseries

NS = 10**9
H = 3600 * NS


class TestTimeWeightedAvg:
    def test_hold_until_next_and_bucket_clamp(self, spark):
        # key a, bucket width 100s: samples at t=0 (v=10) and t=60 (v=20);
        # 10 holds 60s, 20 holds 40s (clamped to bucket end)
        df = spark.createDataFrame(
            [("a", 0, 1, 10.0), ("a", 60 * NS, 2, 20.0)],
            ["k", "ts", "id", "value"],
        )
        out = timeseries.time_weighted_avg(df, ["k"], "value", 100 * NS, "id")
        r = out.collect()[0]
        assert r["twa"] == (10.0 * 60 + 20.0 * 40) / 100
        assert r["covered_nanos"] == 100 * NS
        assert r["n_samples"] == 2

    def test_duplicate_ts_zero_duration(self, spark):
        # duplicates at t=0: only the last (max id) carries duration
        df = spark.createDataFrame(
            [("a", 0, 1, 99.0), ("a", 0, 2, 10.0)],
            ["k", "ts", "id", "value"],
        )
        r = timeseries.time_weighted_avg(
            df, ["k"], "value", 100 * NS, "id"
        ).collect()[0]
        assert r["twa"] == 10.0  # 99.0 contributed zero duration
        assert r["covered_nanos"] == 100 * NS

    def test_no_backfill_across_buckets(self, spark):
        # sample at t=50 in bucket0 only covers [50,100); bucket1 has
        # its own sample at t=150 covering [150,200)
        df = spark.createDataFrame(
            [("a", 50 * NS, 1, 4.0), ("a", 150 * NS, 2, 8.0)],
            ["k", "ts", "id", "value"],
        )
        rows = {
            r["bucket_start"]: (r["twa"], r["covered_nanos"])
            for r in timeseries.time_weighted_avg(
                df, ["k"], "value", 100 * NS, "id"
            ).collect()
        }
        assert rows[0] == (4.0, 50 * NS)
        assert rows[100 * NS] == (8.0, 50 * NS)


class TestGapFillLocf:
    def test_fills_missing_buckets(self, spark):
        df = spark.createDataFrame(
            [("a", 10, 1, 1.0), ("a", 10 + 3 * 100, 2, 5.0)],
            ["k", "ts", "id", "value"],
        )
        out = timeseries.gap_fill_locf(df, ["k"], "value", 100, "id")
        rows = sorted(
            (r["bucket_start"], r["value"], r["filled"]) for r in out.collect()
        )
        assert rows == [
            (0, 1.0, False),
            (100, 1.0, True),   # gap -> carried forward
            (200, 1.0, True),
            (300, 5.0, False),
        ]

    def test_last_sample_in_bucket_wins(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 1, 1.0), ("a", 2, 2, 2.0), ("a", 2, 3, 3.0)],
            ["k", "ts", "id", "value"],
        )
        out = timeseries.gap_fill_locf(df, ["k"], "value", 100, "id").collect()
        assert len(out) == 1
        assert out[0]["value"] == 3.0  # max (ts, id)


class TestRate:
    def test_rate_and_edges(self, spark):
        df = spark.createDataFrame(
            [
                ("a", 0, 1, 100.0),
                ("a", 10 * NS, 2, 150.0),   # +50 over 10s -> 5/s
                ("a", 10 * NS, 3, 150.0),   # dup ts -> None (dt=0)
                ("b", 5 * NS, 4, 7.0),      # first sample -> None
            ],
            ["k", "ts", "id", "value"],
        )
        rates = sorted(
            [
                (r["k"], r["ts"], r["rate_per_sec"])
                for r in timeseries.sample_rate(
                    df, ["k"], "value", "id"
                ).collect()
            ],
            key=lambda t: (t[0], t[1], t[2] is not None, t[2] or 0.0),
        )
        assert rates == [
            ("a", 0, None),
            ("a", 10 * NS, None),       # dup-ts row (dt=0)
            ("a", 10 * NS, 5.0),
            ("b", 5 * NS, None),
        ]


class TestEwmaRows:
    def test_hand_computed_series(self, spark):
        from zikeiretsu_rs_spark.operators import timeseries

        rows = [(1, 10, 1, 4.0), (1, 20, 2, 8.0), (1, 30, 3, 2.0),
                (2, 10, 4, 6.0)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
        out = {
            (r["user_id"], r["ts"]): r["ewma"]
            for r in timeseries.ewma_rows(
                df, ["user_id"], "value", ["ts", "event_id"],
                window=3, alpha=0.25,
            ).collect()
        }
        # weights newest-first: 1, 0.75, 0.5625
        assert out[(1, 10)] == 4.0
        assert out[(1, 20)] == round((8.0 + 0.75 * 4.0) / 1.75, 6)
        assert out[(1, 30)] == round(
            (2.0 + 0.75 * 8.0 + 0.5625 * 4.0) / 2.3125, 6
        )
        assert out[(2, 10)] == 6.0  # keys independent

    def test_partitioning_invariance(self, spark):
        from zikeiretsu_rs_spark.operators import timeseries

        rows = [(u, t, u * 100 + t, float((u * 7 + t) % 13))
                for u in range(3) for t in range(20)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
        a = sorted(map(tuple, timeseries.ewma_rows(
            df.repartition(1), ["user_id"], "value", ["ts", "event_id"]
        ).collect()))
        b = sorted(map(tuple, timeseries.ewma_rows(
            df.repartition(9), ["user_id"], "value", ["ts", "event_id"]
        ).collect()))
        assert a == b
