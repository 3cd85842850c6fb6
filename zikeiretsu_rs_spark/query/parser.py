"""Recursive-descent parser for the zikeiretsu query dialect.

Grammar ported from the reference's PEG grammar
(zikeiretsu/src/tsdb/query/query.pest, 157 lines):

    QUERY  = WITH? SELECT FROM WHERE? ';'?
    WITH   = 'with' define (',' define)*
    define = cols=[a,b,..] | tz=NAME | format=json|table|parquet|parquet_snappy
           | output_file='path' | output_to_memory | use_cache=bool
           | format_datetime=bool | force_sync_cloud=bool | db=name
    SELECT = 'select' ('*' | col (',' col)*)
    FROM   = 'from' metrics
    WHERE  = 'where' (ts REL (datetime | '(' datetime ',' close ')')
                      | metrics '=' name)
    REL    = in | >=|n | >|n | <=|n | <|n | >= | => | > | <= | =< | < | =
    datetime = ('today()'|'yesterday()'|'tomorrow()'|'literal') delta?
    delta  = [+-]? digits unit | [+-]? hh[:mm[:ss]]

Keywords are case-insensitive; whitespace (incl. '\\') and //-comments are
silent (query.pest:3-4). Limit operators parse per
query/parser/parts/datetime_filter_parser.rs:46-84; `in` with a single
builtin-function operand degrades to Equal (datetime_filter_parser.rs:26-40).
"""

from __future__ import annotations

import re

from ..datetime_util import parse_datetime_literal
from ..errors import InvalidDatetimeFilterOperator, ParserError
from .ast import (
    BuildinDatetimeFunction,
    DatetimeFilter,
    DatetimeValue,
    FilterOp,
    OutputFormat,
    ParsedQuery,
    SelectClause,
    WhereClause,
    WithClause,
)

_WS_RE = re.compile(r"(?:[ \t\n\r\\]|//[^\n]*\n)+")
_IDENT_RE = re.compile(r"[A-Za-z0-9_\-]+")
_METRICS_RE = re.compile(r"[A-Za-z0-9_\-.]+")
_TZNAME_RE = re.compile(r"[A-Za-z0-9/+\-_:]+")
_FILEPATH_RE = re.compile(r"[A-Za-z0-9./\\\-_]+")
_DATETIME_STR_RE = re.compile(r"'([A-Za-z0-9. :\-]+)'")
_DURATION_RE = re.compile(
    r"([+-])?\s*(\d+)\s*"
    r"(micros?|millis?|seconds?|minutes?|hours?|days?)(?![A-Za-z0-9])",
    re.IGNORECASE,
)
_CLOCK_RE = re.compile(r"([+-])?\s*(\d{1,2}(?::\d{1,2}){0,2})(?![A-Za-z0-9:])")
_LIMIT_OP_RE = re.compile(r"(>=|=>|<=|=<|>|<)\|(\d+)")
_PLAIN_OP_RE = re.compile(r"(>=|=>|<=|=<|>|<|=)")
_FN_RE = re.compile(r"(today|yesterday|tomorrow)\s*\(\s*\)", re.IGNORECASE)

_DURATION_MICROS = {
    "micro": 1,
    "milli": 1_000,
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
}


class _Cursor:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self) -> None:
        m = _WS_RE.match(self.text, self.pos)
        if m:
            self.pos = m.end()

    def eof(self) -> bool:
        self.skip_ws()
        return self.pos >= len(self.text)

    def peek_keyword(self, kw: str) -> bool:
        """Case-insensitive keyword with the reference's
        `!ASCII_ALPHANUMERIC` lookahead (query.pest:11-53)."""
        self.skip_ws()
        end = self.pos + len(kw)
        if self.text[self.pos : end].lower() != kw.lower():
            return False
        if end < len(self.text) and self.text[end].isalnum():
            return False
        return True

    def take_keyword(self, kw: str) -> bool:
        if self.peek_keyword(kw):
            self.pos += len(kw)
            return True
        return False

    def expect_keyword(self, kw: str) -> None:
        if not self.take_keyword(kw):
            raise ParserError(f"expected '{kw}' at: {self.rest()[:40]!r}")

    def take_literal(self, lit: str) -> bool:
        self.skip_ws()
        if self.text.startswith(lit, self.pos):
            self.pos += len(lit)
            return True
        return False

    def expect_literal(self, lit: str) -> None:
        if not self.take_literal(lit):
            raise ParserError(f"expected '{lit}' at: {self.rest()[:40]!r}")

    def take_re(self, pattern: re.Pattern[str]) -> re.Match[str] | None:
        self.skip_ws()
        m = pattern.match(self.text, self.pos)
        if m:
            self.pos = m.end()
        return m

    def rest(self) -> str:
        return self.text[self.pos :]


def parse_query(query: str) -> ParsedQuery:
    cur = _Cursor(query)

    with_clause: WithClause | None = None
    if cur.peek_keyword("with"):
        with_clause = _parse_with(cur)

    cur.expect_keyword("select")
    select = _parse_select(cur)

    cur.expect_keyword("from")
    m = cur.take_re(_METRICS_RE)
    if m is None:
        raise ParserError(f"expected metrics name at: {cur.rest()[:40]!r}")
    from_metrics = m.group(0)

    where: WhereClause | None = None
    if cur.peek_keyword("where"):
        cur.take_keyword("where")
        where = _parse_filter(cur)

    cur.take_literal(";")
    if not cur.eof():
        raise ParserError(f"unexpected trailing input: {cur.rest()[:40]!r}")

    return ParsedQuery(
        select=select, from_metrics=from_metrics, with_clause=with_clause, where=where
    )


def _parse_with(cur: _Cursor) -> WithClause:
    cur.expect_keyword("with")
    wc = WithClause()
    while True:
        _parse_with_define(cur, wc)
        if not cur.take_literal(","):
            break
    return wc


def _parse_bool(cur: _Cursor) -> bool:
    if cur.take_keyword("true"):
        return True
    if cur.take_keyword("false"):
        return False
    raise ParserError(f"expected boolean at: {cur.rest()[:40]!r}")


def _parse_with_define(cur: _Cursor, wc: WithClause) -> None:
    if cur.take_keyword("cols"):
        cur.expect_literal("=")
        cur.expect_literal("[")
        cols: list[str] = []
        while True:
            m = cur.take_re(_IDENT_RE)
            if m is None:
                raise ParserError(f"expected column name at: {cur.rest()[:40]!r}")
            cols.append(m.group(0))
            if not cur.take_literal(","):
                break
        cur.expect_literal("]")
        wc.columns = cols
    elif cur.take_keyword("tz"):
        cur.expect_literal("=")
        m = cur.take_re(_TZNAME_RE)
        if m is None:
            raise ParserError(f"expected timezone at: {cur.rest()[:40]!r}")
        wc.timezone_name = m.group(0)
    elif cur.take_keyword("format_datetime"):
        cur.expect_literal("=")
        wc.format_datetime = _parse_bool(cur)
    elif cur.take_keyword("format"):
        cur.expect_literal("=")
        for kw, fmt in (
            ("parquet_snappy", OutputFormat.PARQUET_SNAPPY),
            ("parquet", OutputFormat.PARQUET),
            ("json", OutputFormat.JSON),
            ("table", OutputFormat.TABLE),
        ):
            if cur.take_keyword(kw):
                wc.output_format = fmt
                break
        else:
            raise ParserError(f"invalid format at: {cur.rest()[:40]!r}")
    elif cur.take_keyword("output_file"):
        cur.expect_literal("=")
        cur.expect_literal("'")
        m = cur.take_re(_FILEPATH_RE)
        if m is None:
            raise ParserError(f"expected file path at: {cur.rest()[:40]!r}")
        wc.output_file_path = m.group(0)
        cur.expect_literal("'")
    elif cur.take_keyword("output_to_memory"):
        wc.output_to_memory = True
    elif cur.take_keyword("use_cache"):
        cur.expect_literal("=")
        wc.use_cache = _parse_bool(cur)
    elif cur.take_keyword("force_sync_cloud"):
        cur.expect_literal("=")
        wc.force_sync_cloud = _parse_bool(cur)
    elif cur.take_keyword("db"):
        cur.expect_literal("=")
        m = cur.take_re(_IDENT_RE)
        if m is None:
            raise ParserError(f"expected database name at: {cur.rest()[:40]!r}")
        wc.database = m.group(0)
    else:
        raise ParserError(f"unknown with-define at: {cur.rest()[:40]!r}")


def _parse_select(cur: _Cursor) -> SelectClause:
    if cur.take_literal("*"):
        return SelectClause(star=True)
    cols: list[str] = []
    while True:
        m = cur.take_re(_IDENT_RE)
        if m is None:
            raise ParserError(f"expected select column at: {cur.rest()[:40]!r}")
        cols.append(m.group(0))
        if not cur.take_literal(","):
            break
    return SelectClause(star=False, columns=cols)


def _parse_filter(cur: _Cursor) -> WhereClause:
    if cur.take_keyword("ts"):
        return WhereClause(datetime_filter=_parse_datetime_filter(cur))
    if cur.take_keyword("metrics"):
        cur.expect_literal("=")
        m = cur.take_re(_METRICS_RE)
        if m is None:
            raise ParserError(f"expected metrics name at: {cur.rest()[:40]!r}")
        return WhereClause(metrics_filter=m.group(0))
    raise ParserError(f"expected 'ts' or 'metrics' filter at: {cur.rest()[:40]!r}")


def _parse_datetime_filter(cur: _Cursor) -> DatetimeFilter:
    cur.skip_ws()
    limit: int | None = None
    m = cur.take_re(_LIMIT_OP_RE)
    if m is not None:
        sym, limit = m.group(1), int(m.group(2))
        op = {">=": FilterOp.GTE, "=>": FilterOp.GTE, ">": FilterOp.GT,
              "<=": FilterOp.LTE, "=<": FilterOp.LTE, "<": FilterOp.LT}[sym]
    elif cur.take_keyword("in"):
        op = FilterOp.IN
    else:
        m = cur.take_re(_PLAIN_OP_RE)
        if m is None:
            raise InvalidDatetimeFilterOperator(
                f"invalid operator at: {cur.rest()[:40]!r}"
            )
        sym = m.group(1)
        op = {">=": FilterOp.GTE, "=>": FilterOp.GTE, ">": FilterOp.GT,
              "<=": FilterOp.LTE, "=<": FilterOp.LTE, "<": FilterOp.LT,
              "=": FilterOp.EQ}[sym]

    cur.skip_ws()
    if cur.take_literal("("):
        value1 = _parse_datetime_value(cur)
        cur.expect_literal(",")
        value2 = _parse_range_close(cur, value1)
        cur.expect_literal(")")
        if op is not FilterOp.IN:
            raise ParserError("datetime range is only valid with 'in'")
        return DatetimeFilter(op=FilterOp.IN, value1=value1, value2=value2)

    value1 = _parse_datetime_value(cur)
    if op is FilterOp.IN:
        # `ts in <fn>` degrades to Equal; a bare literal is rejected
        # (datetime_filter_parser.rs:26-38).
        if value1.function is None:
            raise ParserError("'in' needs datetime range or buildin function")
        return DatetimeFilter(op=FilterOp.EQ, value1=value1)
    return DatetimeFilter(op=op, value1=value1, limit=limit)


def _parse_datetime_value(cur: _Cursor) -> DatetimeValue:
    cur.skip_ws()
    m = cur.take_re(_FN_RE)
    if m is not None:
        base = DatetimeValue(function=BuildinDatetimeFunction(m.group(1).lower()))
    else:
        m = cur.take_re(_DATETIME_STR_RE)
        if m is None:
            raise ParserError(f"expected datetime at: {cur.rest()[:40]!r}")
        base = DatetimeValue(literal_nanos=parse_datetime_literal(m.group(1)))
    delta = _try_parse_delta(cur)
    if delta is not None:
        base = base.with_extra_delta(delta)
    return base


def _parse_range_close(cur: _Cursor, value1: DatetimeValue) -> DatetimeValue:
    """DATETIME_RANGE_CLOSE = DATETIME_DELTA | DATETIME (query.pest:102).
    A bare delta composes onto value1's base + delta
    (datetime_filter_parser.rs:243-267)."""
    delta = _try_parse_delta(cur)
    if delta is not None:
        return value1.with_extra_delta(delta)
    return _parse_datetime_value(cur)


def _try_parse_delta(cur: _Cursor) -> int | None:
    """Parse a duration (`+ 2 hours`) or clock (`+9:00`) delta into
    microseconds. Duration units per duration_parser.rs:15-96; clock per
    clock_parser.rs:7-120 (hh[:mm[:ss]] -> fixed-offset seconds)."""
    m = cur.take_re(_DURATION_RE)
    if m is not None:
        sign = -1 if m.group(1) == "-" else 1
        unit = m.group(3).lower().rstrip("s")
        if unit not in _DURATION_MICROS:
            unit = {"micro": "micro", "milli": "milli"}.get(unit, unit)
        return sign * int(m.group(2)) * _DURATION_MICROS[unit]
    m = cur.take_re(_CLOCK_RE)
    if m is not None:
        sign = -1 if m.group(1) == "-" else 1
        parts = [int(p) for p in m.group(2).split(":")]
        while len(parts) < 3:
            parts.append(0)
        h, mi, s = parts
        return sign * (h * 3600 + mi * 60 + s) * 1_000_000
    return None
