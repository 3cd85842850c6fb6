"""Analyzer golden cases ported from lexer tests:
- `ts = x` accuracy expansion at JST (lexer/where.rs:90-172)
- projection reorder (lexer/select.rs:71-114)
- output validation matrix (lexer/mod.rs:356-417)
"""

import pytest

from zikeiretsu_rs_spark.datetime_util import (
    NANOS_PER_DAY,
    NANOS_PER_HOUR,
    NANOS_PER_MINUTE,
    NANOS_PER_SEC,
)
from zikeiretsu_rs_spark.errors import (
    CannotOutputToFile,
    EmptyFilterCondition,
    InvalidOutputDestination,
    InvalidOutputFormat,
    MetricsFilterIsNotSupported,
    NoColumnDef,
)
from zikeiretsu_rs_spark.query.analyzer import (
    DescribeMetricsQuery,
    LimitKind,
    ListMetricsQuery,
    SearchMetricsQuery,
    interpret,
)
from zikeiretsu_rs_spark.query.parser import parse_query

from test_datetime_util import nanos

JST = 9 * 3600
NOW = nanos(2021, 10, 1, 12)  # frozen "now" for today()/yesterday()


def analyze(q: str) -> object:
    return interpret(parse_query(q), NOW)


class TestEqualAccuracyExpansion:
    """lexer_datetime_eq_1..4 (lexer/where.rs:90-172): literal parsed as
    naive wall-clock, shifted by tz (JST -> minus 9h instant), widened by
    its accuracy."""

    def test_eq_day(self):
        r = analyze("with tz=+9 select * from t where ts = '2021-09-27'").condition
        start = nanos(2021, 9, 27) - JST * NANOS_PER_SEC
        assert r.since_nanos == start
        assert r.until_nanos == start + NANOS_PER_DAY
        assert r.limit is None

    def test_eq_hour(self):
        r = analyze("with tz=+9 select * from t where ts = '2021-09-27 23:00'").condition
        start = nanos(2021, 9, 27, 23) - JST * NANOS_PER_SEC
        assert r.since_nanos == start
        assert r.until_nanos == start + NANOS_PER_HOUR

    def test_eq_minute(self):
        r = analyze("with tz=+9 select * from t where ts = '2021-09-27 23:10'").condition
        start = nanos(2021, 9, 27, 23, 10) - JST * NANOS_PER_SEC
        assert r.since_nanos == start
        assert r.until_nanos == start + NANOS_PER_MINUTE

    def test_eq_second(self):
        r = analyze(
            "with tz=+9 select * from t where ts = '2021-09-27 23:00:01'"
        ).condition
        start = nanos(2021, 9, 27, 23, 0, 1) - JST * NANOS_PER_SEC
        assert r.since_nanos == start
        assert r.until_nanos == start + NANOS_PER_SEC


class TestRangesAndLimits:
    def test_in_range_half_open(self):
        r = analyze(
            "select * from t where ts in ('2020-01-01', '2020-01-02')"
        ).condition
        assert r.since_nanos == nanos(2020, 1, 1)
        assert r.until_nanos == nanos(2020, 1, 2)

    def test_gt_is_gte_plus_1ns(self):
        # lexer/where.rs:36-42
        r = analyze("select * from t where ts > '2020-01-01'").condition
        assert r.since_nanos == nanos(2020, 1, 1) + 1
        assert r.until_nanos is None

    def test_lte_is_lt_plus_1ns(self):
        r = analyze("select * from t where ts <= '2020-01-01'").condition
        assert r.until_nanos == nanos(2020, 1, 1) + 1

    def test_lt(self):
        r = analyze("select * from t where ts < '2020-01-01'").condition
        assert r.until_nanos == nanos(2020, 1, 1)

    def test_head_tail_limits(self):
        r = analyze("select * from t where ts >=|2 '2020-01-01'").condition
        assert r.limit.kind is LimitKind.HEAD and r.limit.n == 2
        r = analyze("select * from t where ts <|7 '2020-01-01'").condition
        assert r.limit.kind is LimitKind.TAIL and r.limit.n == 7

    def test_today_resolution(self):
        # NOW is 2021-10-01T12:00Z; today() in UTC = 2021-10-01T00:00Z
        r = analyze("select * from t where ts = today()").condition
        assert r.since_nanos == nanos(2021, 10, 1)
        assert r.until_nanos == nanos(2021, 10, 2)

    def test_yesterday_in_jst(self):
        # NOW in JST is 2021-10-01T21:00 local -> yesterday = 2021-09-30
        # local midnight -> instant minus 9h
        r = analyze("with tz=+9 select * from t where ts = yesterday()").condition
        assert r.since_nanos == nanos(2021, 9, 30) - JST * NANOS_PER_SEC


class TestProjection:
    def test_reorder(self):
        # lex_select_1: select c2, c1, c3 with cols [c1, c2, c3] -> [1, 0, 2]
        q = analyze("with cols=[c1,c2,c3] select c2, c1, c3 from t where ts in today()")
        assert q.field_selectors == (1, 0, 2)
        assert q.field_names == ("ts", "c2", "c1", "c3")

    def test_star_passes_all(self):
        q = analyze("with cols=[c1,c2,c3] select * from t where ts in today()")
        assert q.field_selectors is None
        assert q.field_names == ("ts", "c1", "c2", "c3")

    def test_star_without_cols(self):
        q = analyze("select * from t where ts in today()")
        assert q.field_selectors is None
        assert q.field_names is None

    def test_named_without_cols_errors(self):
        with pytest.raises(NoColumnDef):
            analyze("select c1 from t where ts in today()")

    def test_unknown_name_errors(self):
        with pytest.raises(NoColumnDef):
            analyze("with cols=[c1] select c9 from t where ts in today()")

    def test_ts_in_select_list_is_implicit(self):
        # divergence: reference lexer would reject `ts` here
        q = analyze("with cols=[c1,c2] select ts, c2 from t where ts in today()")
        assert q.field_selectors == (1,)
        assert q.field_names == ("ts", "c2")


class TestValidation:
    def test_where_required_for_data_queries(self):
        with pytest.raises(EmptyFilterCondition):
            analyze("select * from t")

    def test_metrics_filter_only_for_describe(self):
        with pytest.raises(MetricsFilterIsNotSupported):
            analyze("select * from t where metrics = x")
        q = analyze("select * from .describe where metrics = x")
        assert isinstance(q, DescribeMetricsQuery)
        assert q.metrics_filter == "x"

    def test_builtin_routing(self):
        assert isinstance(analyze("select * from .metrics"), ListMetricsQuery)
        q = analyze("select * from .block_list")
        assert isinstance(q, DescribeMetricsQuery) and q.block_list

    def test_output_matrix(self):
        # memory + non-table -> error (lexer/mod.rs:120-125)
        with pytest.raises(InvalidOutputFormat):
            analyze(
                "with output_to_memory, format = json select * from .metrics"
            )
        # parquet + stdout -> error (lexer/mod.rs:128-141)
        with pytest.raises(InvalidOutputDestination):
            analyze("with format = parquet select * from .metrics")
        # memory + file -> error (lexer/mod.rs:146-149)
        with pytest.raises(CannotOutputToFile):
            analyze(
                "with output_to_memory, output_file = '/tmp/x' select * from .metrics"
            )
        # parquet + file -> ok
        q = analyze(
            "with format = parquet, output_file = '/tmp/x' select * from .metrics"
        )
        assert isinstance(q, ListMetricsQuery)

    def test_search_query_shape(self):
        q = analyze(
            "with cols=[a,b], tz=Asia/Tokyo select * from trades where ts in (yesterday(), today())"
        )
        assert isinstance(q, SearchMetricsQuery)
        assert q.metrics == "trades"
        assert q.timezone.offset_seconds == JST
        # yesterday JST midnight .. today JST midnight (half-open)
        assert q.condition.until_nanos - q.condition.since_nanos == NANOS_PER_DAY
