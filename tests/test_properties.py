"""Property-based tests (hypothesis) for the two subtlest semantics:
datetime-accuracy equality expansion and distinct-timestamp limits
(SURVEY.md §5 rebuild test plan item c)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from zikeiretsu_rs_spark.datetime_util import (
    NANOS_PER_DAY,
    NANOS_PER_HOUR,
    NANOS_PER_MINUTE,
    NANOS_PER_SEC,
    DatetimeAccuracy,
    accuracy_of_local_nanos,
)
from zikeiretsu_rs_spark.query.analyzer import compile_datetime_filter
from zikeiretsu_rs_spark.query.ast import DatetimeFilter, DatetimeValue, FilterOp

DAY_RANGE = st.integers(min_value=0, max_value=30_000)  # ~1970..2052


@st.composite
def local_nanos(draw):
    day = draw(DAY_RANGE)
    h = draw(st.integers(0, 23))
    m = draw(st.integers(0, 59))
    s = draw(st.integers(0, 59))
    frac = draw(
        st.one_of(
            st.just(0),
            st.integers(1, 999),  # sub-us (x1ns)
            st.builds(lambda x: x * 1_000, st.integers(1, 999)),  # us-aligned
            st.builds(lambda x: x * 1_000_000, st.integers(1, 999)),  # ms-aligned
        )
    )
    return day * NANOS_PER_DAY + h * NANOS_PER_HOUR + m * NANOS_PER_MINUTE + s * NANOS_PER_SEC + frac


class TestAccuracyProperties:
    @given(local_nanos())
    @settings(max_examples=300)
    def test_width_consistent_with_components(self, nanos):
        acc = accuracy_of_local_nanos(nanos)
        frac = nanos % NANOS_PER_SEC
        day_sec = (nanos // NANOS_PER_SEC) % 86_400
        if frac == 0:
            if day_sec == 0:
                assert acc is DatetimeAccuracy.DAY
            elif day_sec % 3600 == 0:
                assert acc is DatetimeAccuracy.HOUR
            elif day_sec % 60 == 0:
                assert acc is DatetimeAccuracy.MINUTE
            else:
                assert acc is DatetimeAccuracy.SECOND
        elif frac % 1_000 != 0:
            assert acc is DatetimeAccuracy.MICRO  # reference quirk
        elif frac % 1_000_000 != 0:
            assert acc is DatetimeAccuracy.MILLI
        else:
            assert acc is DatetimeAccuracy.NANO

    @given(local_nanos(), st.integers(-14 * 3600, 14 * 3600))
    @settings(max_examples=200)
    def test_eq_window_contains_value_and_is_half_open(self, lit, offset):
        flt = DatetimeFilter(op=FilterOp.EQ, value1=DatetimeValue(literal_nanos=lit))
        cond = compile_datetime_filter(flt, offset, now_utc_nanos=0)
        instant = lit - offset * NANOS_PER_SEC
        assert cond.since_nanos == instant
        assert cond.since_nanos < cond.until_nanos
        width = cond.until_nanos - cond.since_nanos
        assert width in {
            1,
            1_000,
            1_000_000,
            NANOS_PER_SEC,
            NANOS_PER_MINUTE,
            NANOS_PER_HOUR,
            NANOS_PER_DAY,
        }

    @given(local_nanos(), st.sampled_from([FilterOp.GT, FilterOp.GTE, FilterOp.LT, FilterOp.LTE]))
    @settings(max_examples=200)
    def test_boundary_shifts(self, lit, op):
        flt = DatetimeFilter(op=op, value1=DatetimeValue(literal_nanos=lit))
        cond = compile_datetime_filter(flt, 0, now_utc_nanos=0)
        if op is FilterOp.GT:
            assert cond.since_nanos == lit + 1
        elif op is FilterOp.GTE:
            assert cond.since_nanos == lit
        elif op is FilterOp.LT:
            assert cond.until_nanos == lit
        else:
            assert cond.until_nanos == lit + 1


class TestLimitProperties:
    """Distinct-ts limit against a pure-Python oracle on duplicate-heavy
    timestamp lists (one Spark job over many hypothesis cases would be
    slow, so the Spark operator itself is exercised once per case set in
    test_limits_spark below)."""

    @staticmethod
    def python_oracle(ts_list, n, tail):
        distinct = sorted(set(ts_list))
        keep = set(distinct[-n:] if tail else distinct[:n]) if n else set()
        return sorted(t for t in ts_list if t in keep)

    @given(
        st.lists(st.integers(0, 20), min_size=0, max_size=60),
        st.integers(0, 10),
        st.booleans(),
    )
    @settings(max_examples=300)
    def test_threshold_formulation_matches_oracle(self, ts_list, n, tail):
        # the operator's threshold semantics, re-expressed in python:
        # keep rows <= n-th distinct asc (head) / >= n-th distinct desc
        expected = self.python_oracle(ts_list, n, tail)
        if n == 0 or not ts_list:
            got = []
        else:
            distinct = sorted(set(ts_list), reverse=tail)[:n]
            thr = distinct[-1]
            got = sorted(
                t for t in ts_list if (t >= thr if tail else t <= thr)
            )
        assert got == expected


def test_limits_spark_random_cases(spark):
    """One consolidated Spark check of limit_distinct_ts against the
    python oracle on a duplicate-heavy frame."""
    import random

    from zikeiretsu_rs_spark.operators.limits import limit_distinct_ts

    rng = random.Random(42)
    ts_list = [rng.randint(0, 30) for _ in range(200)]
    df = spark.createDataFrame([(t,) for t in ts_list], ["ts"])
    for n in (0, 1, 5, 31):
        for tail in (False, True):
            got = sorted(
                r["ts"] for r in limit_distinct_ts(df, n, tail=tail).collect()
            )
            assert got == TestLimitProperties.python_oracle(ts_list, n, tail), (
                n,
                tail,
            )
