"""Golden cases for datetime semantics, ported from the reference's
inline tests (datetime/util.rs:122-147, lexer/where.rs:79-202)."""

import pytest

from zikeiretsu_rs_spark.datetime_util import (
    NANOS_PER_DAY,
    NANOS_PER_HOUR,
    NANOS_PER_MINUTE,
    NANOS_PER_SEC,
    DatetimeAccuracy,
    accuracy_of_local_nanos,
    format_rfc3339_nanos,
    parse_datetime_literal,
    resolve_timezone,
    today_nanos,
    tomorrow_nanos,
    yesterday_nanos,
)
from zikeiretsu_rs_spark.errors import InvalidDatetimeFormat


def nanos(y, mo, d, h=0, mi=0, s=0, frac=0):
    from datetime import date

    days = date(y, mo, d).toordinal() - date(1970, 1, 1).toordinal()
    return (
        days * NANOS_PER_DAY
        + h * NANOS_PER_HOUR
        + mi * NANOS_PER_MINUTE
        + s * NANOS_PER_SEC
        + frac
    )


class TestParseDatetimeLiteral:
    """Port of parse_datetetime_test (datetime/util.rs:127-146)."""

    def test_formats_accepted(self):
        assert parse_datetime_literal("2019-12-13 23:33:12") == nanos(2019, 12, 13, 23, 33, 12)
        # chrono parsing-%f semantics: digit run = raw nanosecond count
        assert parse_datetime_literal("2019-12-13 23:33:12.023") == nanos(
            2019, 12, 13, 23, 33, 12, 23
        )
        # 9-digit fraction = nanoseconds
        assert parse_datetime_literal("2021-09-27 09:42:40.741778000") == nanos(
            2021, 9, 27, 9, 42, 40, 741_778_000
        )
        assert parse_datetime_literal("2019-12-13 23:33") == nanos(2019, 12, 13, 23, 33)
        assert parse_datetime_literal("2019-12-13") == nanos(2019, 12, 13)

    def test_invalid(self):
        with pytest.raises(InvalidDatetimeFormat):
            parse_datetime_literal("2019-13-45")
        with pytest.raises(InvalidDatetimeFormat):
            parse_datetime_literal("not a date")

    def test_fraction_raw_nanos(self):
        """Golden pin of the chrono parsing-`%f` divergence fix: sub-9-digit
        fractions are RAW nanosecond counts ('.5' = 5 ns, '.023' = 23 ns),
        matching the reference's `%H:%M:%S.%f` parse (datetime/util.rs:74).
        Only 9-digit fractions coincide with the decimal-fraction reading."""
        assert parse_datetime_literal("2020-01-01 00:00:00.5") == nanos(
            2020, 1, 1, frac=5
        )
        assert parse_datetime_literal("2020-01-01 00:00:00.500000000") == nanos(
            2020, 1, 1, frac=500_000_000
        )


class TestAccuracy:
    """Port of DatetimeAccuracy::from_datetime (datetime/util.rs:41-57),
    including the reference's inverted sub-second mapping."""

    def test_coarse(self):
        assert accuracy_of_local_nanos(nanos(2021, 9, 27)) is DatetimeAccuracy.DAY
        assert accuracy_of_local_nanos(nanos(2021, 9, 27, 23)) is DatetimeAccuracy.HOUR
        assert accuracy_of_local_nanos(nanos(2021, 9, 27, 23, 10)) is DatetimeAccuracy.MINUTE
        assert accuracy_of_local_nanos(nanos(2021, 9, 27, 23, 0, 1)) is DatetimeAccuracy.SECOND

    def test_subsecond_reference_quirk(self):
        # nano % 1_000 != 0 -> MICRO (1us window)
        assert accuracy_of_local_nanos(nanos(2021, 9, 27, frac=123)) is DatetimeAccuracy.MICRO
        # nano % 1_000_000 != 0 (but us-aligned) -> MILLI (1ms window)
        assert (
            accuracy_of_local_nanos(nanos(2021, 9, 27, frac=123_000)) is DatetimeAccuracy.MILLI
        )
        # ms-aligned -> NANO (1ns window)
        assert (
            accuracy_of_local_nanos(nanos(2021, 9, 27, frac=123_000_000))
            is DatetimeAccuracy.NANO
        )


class TestTodayFamily:
    def test_today_in_tz(self):
        # 2021-09-27T20:00:00Z; in +09:00 it is already 2021-09-28 05:00
        now = nanos(2021, 9, 27, 20)
        jst = 9 * 3600
        assert today_nanos(0, now) == nanos(2021, 9, 27)
        assert today_nanos(jst, now) == nanos(2021, 9, 28) - jst * NANOS_PER_SEC
        assert yesterday_nanos(0, now) == nanos(2021, 9, 26)
        assert tomorrow_nanos(0, now) == nanos(2021, 9, 28)


class TestTimezone:
    def test_fixed_offsets(self):
        assert resolve_timezone("+09:00").offset_seconds == 9 * 3600
        assert resolve_timezone("-05:30").offset_seconds == -(5 * 3600 + 30 * 60)
        assert resolve_timezone("UTC").offset_seconds == 0

    def test_iana(self):
        # Asia/Tokyo has no DST: always +9
        assert resolve_timezone("Asia/Tokyo").offset_seconds == 9 * 3600


class TestFormatting:
    def test_rfc3339_nanos(self):
        ts = nanos(2021, 9, 27, 9, 42, 40, 741_778_000)
        assert format_rfc3339_nanos(ts, 0) == "2021-09-27T09:42:40.741778000+00:00"
        assert (
            format_rfc3339_nanos(ts, 9 * 3600) == "2021-09-27T18:42:40.741778000+09:00"
        )
