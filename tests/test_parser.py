"""Parser golden cases ported from the reference's parser tests
(query/parser/mod.rs:179-482) plus delta/clock/limit operator cases
(parts/{duration,clock,datetime_filter}_parser.rs)."""

import pytest

from zikeiretsu_rs_spark.errors import ParserError
from zikeiretsu_rs_spark.query.ast import (
    BuildinDatetimeFunction,
    FilterOp,
    OutputFormat,
)
from zikeiretsu_rs_spark.query.parser import parse_query

HOUR_US = 3_600 * 1_000_000


class TestFullQueries:
    """parse_query_1..10 (parser/mod.rs:327-482)."""

    def test_query_1_with_cols_tz_no_where(self):
        q = """with

        cols = [is_buy, volume, price],
 \t   tz = Asia/Tokyo
select *
 from trades  """
        p = parse_query(q)
        assert p.with_clause.columns == ["is_buy", "volume", "price"]
        assert p.with_clause.timezone_name == "Asia/Tokyo"
        assert p.select.star
        assert p.from_metrics == "trades"
        assert p.where is None

    def test_query_2_in_today(self):
        q = "with cols = [is_buy, volume, price], tz = Asia/Tokyo\nselect * from trades where ts in today()"
        p = parse_query(q)
        f = p.where.datetime_filter
        # `in <fn>` degrades to Equal (datetime_filter_parser.rs:26-38)
        assert f.op is FilterOp.EQ
        assert f.value1.function is BuildinDatetimeFunction.TODAY

    def test_query_6_literal_range(self):
        q = """with
\tcols = [_, volume, price],
\ttz = Asia/Tokyo

select ts, volume, price
from trades
where ts in ('2012-12-13 9:00:00', '2012-12-13 9:00:00')
 """
        p = parse_query(q)
        f = p.where.datetime_filter
        assert f.op is FilterOp.IN
        assert f.value1.literal_nanos == f.value2.literal_nanos
        assert p.select.columns == ["ts", "volume", "price"]

    def test_query_7_fn_with_clock_and_duration_delta(self):
        q = """with
  \t    cols = [_, volume, price],
  \t    tz = Asia/Tokyo
     select ts, volume, price
     from trades
     where ts in (yesterday() + 9:00, today() + 2 hours )
 """
        p = parse_query(q)
        f = p.where.datetime_filter
        assert f.op is FilterOp.IN
        assert f.value1.function is BuildinDatetimeFunction.YESTERDAY
        assert f.value1.delta_micros == 9 * HOUR_US
        assert f.value2.function is BuildinDatetimeFunction.TODAY
        assert f.value2.delta_micros == 2 * HOUR_US

    def test_query_8_db_define(self):
        q = "with db = some, cols = [_, volume, price] select * from trades where ts in today()"
        p = parse_query(q)
        assert p.with_clause.database == "some"

    def test_query_9_force_sync_cloud(self):
        q = "with force_sync_cloud = true, cols = [a] select * from t where ts in today()"
        p = parse_query(q)
        assert p.with_clause.force_sync_cloud is True

    def test_query_10_head_limit(self):
        q = "select * from trades where ts >=|2 yesterday()"
        p = parse_query(q)
        f = p.where.datetime_filter
        assert f.op is FilterOp.GTE
        assert f.limit == 2
        assert f.value1.function is BuildinDatetimeFunction.YESTERDAY


class TestOperators:
    @pytest.mark.parametrize(
        "op_text,op,limit",
        [
            (">=", FilterOp.GTE, None),
            ("=>", FilterOp.GTE, None),
            (">", FilterOp.GT, None),
            ("<=", FilterOp.LTE, None),
            ("=<", FilterOp.LTE, None),
            ("<", FilterOp.LT, None),
            ("=", FilterOp.EQ, None),
            (">=|3", FilterOp.GTE, 3),
            ("=>|3", FilterOp.GTE, 3),
            (">|3", FilterOp.GT, 3),
            ("<=|5", FilterOp.LTE, 5),
            ("=<|5", FilterOp.LTE, 5),
            ("<|5", FilterOp.LT, 5),
        ],
    )
    def test_rel_ops(self, op_text, op, limit):
        p = parse_query(f"select * from t where ts {op_text} '2020-01-02'")
        f = p.where.datetime_filter
        assert f.op is op
        assert f.limit == limit

    def test_in_bare_literal_rejected(self):
        with pytest.raises(ParserError):
            parse_query("select * from t where ts in '2020-01-02'")

    def test_metrics_filter(self):
        p = parse_query("select * from .describe where metrics = trades")
        assert p.where.metrics_filter == "trades"


class TestDeltas:
    def test_duration_no_space(self):
        # parse_chronos_2: "'2012-12-13 9:00:00' - 1hour"
        p = parse_query("select * from t where ts >= '2012-12-13 9:00:00' - 1hour")
        assert p.where.datetime_filter.value1.delta_micros == -HOUR_US

    @pytest.mark.parametrize(
        "text,micros",
        [
            ("+ 2 hours", 2 * HOUR_US),
            ("- 30 minutes", -30 * 60 * 1_000_000),
            ("+10 seconds", 10 * 1_000_000),
            ("+5 millis", 5_000),
            ("+7 micros", 7),
            ("+1 day", 86_400 * 1_000_000),
            ("+ 9:00", 9 * HOUR_US),
            ("-9:30", -(9 * 3600 + 30 * 60) * 1_000_000),
            ("+0:00:30", 30 * 1_000_000),
        ],
    )
    def test_delta_forms(self, text, micros):
        p = parse_query(f"select * from t where ts >= today() {text}")
        assert p.where.datetime_filter.value1.delta_micros == micros

    def test_range_close_bare_delta_composits(self):
        # ('2012-12-30', 2 hours): close = base + delta
        # (datetime_filter_parser.rs:243-267)
        p = parse_query("select * from t where ts in ('2012-12-30', 2 hours)")
        f = p.where.datetime_filter
        assert f.value2.literal_nanos == f.value1.literal_nanos
        assert f.value2.delta_micros == 2 * HOUR_US

    def test_range_close_delta_composits_onto_base_delta(self):
        p = parse_query(
            "select * from t where ts in (yesterday() + 9:00, + 2 hours)"
        )
        f = p.where.datetime_filter
        assert f.value1.delta_micros == 9 * HOUR_US
        assert f.value2.delta_micros == 11 * HOUR_US


class TestWithDefines:
    def test_formats(self):
        for text, fmt in [
            ("json", OutputFormat.JSON),
            ("table", OutputFormat.TABLE),
            ("parquet", OutputFormat.PARQUET),
            ("parquet_snappy", OutputFormat.PARQUET_SNAPPY),
        ]:
            p = parse_query(
                f"with format = {text}, output_file = '/tmp/o' select * from t where ts in today()"
            )
            assert p.with_clause.output_format is fmt

    def test_output_file_and_memory(self):
        p = parse_query(
            "with output_file = '/tmp/out.parquet' select * from t where ts in today()"
        )
        assert p.with_clause.output_file_path == "/tmp/out.parquet"
        p = parse_query("with output_to_memory select * from t where ts in today()")
        assert p.with_clause.output_to_memory is True

    def test_tz_offset_form(self):
        p = parse_query("with tz =+9 select * from t where ts in today()")
        assert p.with_clause.timezone_name == "+9"

    def test_case_insensitive_keywords(self):
        p = parse_query("WITH COLS = [a], TZ = UTC SELECT * FROM t WHERE ts IN TODAY()")
        assert p.with_clause.columns == ["a"]

    def test_semicolon_and_comment(self):
        p = parse_query("select * from t where ts in today() // trailing comment\n;")
        assert p.from_metrics == "t"
