"""Property tests: as-of join vs a naive per-row reference on random
duplicate-heavy frames, and streaming/batch operator consistency."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zikeiretsu_rs_spark.operators import aggregates, joins
from zikeiretsu_rs_spark.streaming.ingest import streaming_time_bucket

NS = 10**9

# small ts/key domains force duplicates and boundary collisions
ts_vals = st.integers(min_value=0, max_value=8).map(lambda s: s * NS)
keys = st.integers(min_value=1, max_value=3)

left_rows = st.lists(
    st.tuples(keys, ts_vals), min_size=1, max_size=12, unique=True
)
right_rows = st.lists(
    st.tuples(keys, ts_vals), min_size=0, max_size=12, unique=True
)


def naive_asof(left, right):
    """Reference semantics: latest right (ts <= left.ts, same key),
    ties by max tiebreak id."""
    out = {}
    for lk, lts in left:
        best = None
        for i, (rk, rts) in enumerate(right):
            if rk == lk and rts <= lts:
                cand = (rts, i)
                if best is None or cand > best:
                    best = cand
        out[(lk, lts)] = None if best is None else (best[0], right[best[1]])
    return out


class TestAsofProperty:
    @settings(max_examples=15, deadline=None)
    @given(left=left_rows, right=right_rows)
    def test_matches_naive(self, spark, left, right):
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)],
            ["user_id", "ts", "lid"],
        )
        rdf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(right)],
            ["user_id", "ts", "rid"],
        ) if right else spark.createDataFrame([], T.StructType([
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("rid", T.LongType()),
        ]))
        out = joins.asof_join_backward(
            ldf, rdf, on=["user_id"], payload_cols=["rid"],
            tiebreak_col="rid", prefix="m_",
        ).collect()
        expect = naive_asof(left, right)
        assert len(out) == len(left)
        for r in out:
            exp = expect[(r["user_id"], r["ts"])]
            if exp is None:
                assert r["m_ts"] is None and r["m_rid"] is None
            else:
                m_ts, (rk, rts) = exp
                assert r["m_ts"] == rts
                # the winning rid is the max index among (key, max_ts)
                winners = [
                    i for i, (k2, t2) in enumerate(right)
                    if k2 == r["user_id"] and t2 == m_ts
                ]
                assert r["m_rid"] == max(winners)


class TestStreamingBatchConsistency:
    def test_time_bucket_same_answer(self, spark):
        """The streaming windowed aggregation, evaluated in batch mode,
        must agree with the batch time_bucket operator on the same
        events (same bucketing, same counts/sums)."""
        rows = [
            (dt.datetime(2024, 1, 1, 0, m, s), "a", float(m + s))
            for m in range(0, 12, 2)
            for s in (0, 30)
        ]
        schema = T.StructType(
            [
                T.StructField("tst", T.TimestampType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        df = spark.createDataFrame(rows, schema)
        stream_style = streaming_time_bucket(
            df.withColumnRenamed("tst", "ts"),
            bucket="5 minutes",
            group_cols=["event_type"],
            value_col="value",
        )
        batch_style = aggregates.time_bucket(
            df.select(
                (F.unix_micros("tst") * 1000).alias("ts"),
                "event_type",
                "value",
            ),
            5 * 60 * NS,
            ["event_type"],
            "value",
        )
        got_stream = {
            (r["bucket_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in stream_style.withColumn(
                "bucket_start", F.unix_micros("bucket_start") * 1000
            ).collect()
        }
        got_batch = {
            (r["bucket_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in batch_style.collect()
        }
        assert got_stream == got_batch


# -- funnel / retention invariants ------------------------------------------


class TestFunnelProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    events = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),        # user
            st.integers(min_value=0, max_value=5000),     # ts (nanos)
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=10, deadline=None)
    @given(rows=events)
    def test_stage_counts_monotone_nonincreasing(self, spark, rows):
        """A funnel can never gain sessions at a later stage, for any
        event soup and any session structure."""
        from zikeiretsu_rs_spark.operators import sessionize as sz

        df = spark.createDataFrame(
            rows, "user_id bigint, ts bigint, event_type string"
        )
        out = sorted(
            sz.funnel(
                df, ["view", "click", "purchase"], gap_nanos=500
            ).collect(),
            key=lambda r: r["stage_idx"],
        )
        counts = [r["n_sessions"] for r in out]
        assert counts == sorted(counts, reverse=True)
        assert all(0 <= r["n_sessions"] for r in out)

    @settings(max_examples=10, deadline=None)
    @given(rows=events)
    def test_retention_base_equals_cohort_size(self, spark, rows):
        """Offset 0 always holds the whole cohort (retention 1.0), and
        no offset can exceed it."""
        from zikeiretsu_rs_spark.operators import aggregates

        df = spark.createDataFrame(
            [(u, t) for (u, t, _) in rows], "user_id bigint, ts bigint"
        )
        out = aggregates.cohort_retention(df, 1000).collect()
        base = {
            r["cohort_bucket"]: r["n_users"]
            for r in out
            if r["bucket_offset"] == 0
        }
        for r in out:
            assert r["cohort_bucket"] in base  # every cohort has offset 0
            assert r["n_users"] <= base[r["cohort_bucket"]]
            if r["bucket_offset"] == 0:
                assert r["retention"] == 1.0
