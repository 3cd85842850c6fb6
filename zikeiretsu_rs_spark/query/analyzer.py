"""Analyzer ("lexer" in the reference): ParsedQuery -> InterpretedQuery.

Ports the semantics of zikeiretsu/src/tsdb/query/lexer/{mod,with,select,
from,where}.rs:

- FROM resolves builtin metrics `.metrics` / `.describe` / `.block_list`
  (lexer/from.rs:6-37).
- WITH builds the column name->index map and effective timezone
  (lexer/with.rs:42-108); defaults: tz=UTC, format=table,
  format_datetime=true.
- SELECT named columns resolve through the cols map, erroring with
  NoColumnDef otherwise; `select *` passes None selectors
  (lexer/select.rs:6-57). The output always prepends `ts`
  (lexer/mod.rs:190-228).
- WHERE datetime filters compile to a half-open nanosecond range
  [since, until) plus an optional head/tail distinct-timestamp limit
  (lexer/where.rs:19-77); WHERE is mandatory for data queries
  (EmptyFilterCondition, lexer/mod.rs:230-235); `metrics =` filters are
  rejected outside `.describe`/`.block_list` (lexer/mod.rs:339-348).
- Output condition validation matrix (lexer/mod.rs:112-177):
  memory -> table only; parquet -> file only; memory + file is an error.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from ..datetime_util import (
    DEFAULT_TIMEZONE,
    TimeZoneAndOffset,
    accuracy_of_local_nanos,
    resolve_timezone,
    today_nanos,
    tomorrow_nanos,
    yesterday_nanos,
)
from ..errors import (
    CannotOutputToFile,
    EmptyFilterCondition,
    InvalidMetrics,
    InvalidOutputDestination,
    InvalidOutputFormat,
    MetricsFilterIsNotSupported,
    NoColumnDef,
)
from .ast import (
    BuildinDatetimeFunction,
    DatetimeFilter,
    DatetimeValue,
    FilterOp,
    OutputFormat,
    ParsedQuery,
)

NANOS_PER_SEC = 1_000_000_000


class LimitKind(Enum):
    HEAD = "head"
    TAIL = "tail"


@dataclass(frozen=True)
class SearchLimit:
    """Distinct-timestamp limit (reference SearchDatapointsLimit,
    datapoint.rs:82-100): counts distinct `ts` values, keeping all rows
    that share a retained timestamp."""

    kind: LimitKind
    n: int


@dataclass(frozen=True)
class SearchCondition:
    """Half-open [since, until) range in epoch nanos + optional limit
    (reference DatapointsSearchCondition)."""

    since_nanos: int | None
    until_nanos: int | None
    limit: SearchLimit | None = None


@dataclass(frozen=True)
class OutputCondition:
    output_format: OutputFormat
    output_to_memory: bool
    output_file_path: str | None

    def validate(self) -> None:
        """Port of OutputCondition::output_wirter +
        validate_available_for_format (lexer/mod.rs:112-177)."""
        if self.output_to_memory:
            if self.output_file_path is not None:
                raise CannotOutputToFile("memory")
            if self.output_format is not OutputFormat.TABLE:
                raise InvalidOutputFormat(
                    "output format must be 'Table' when output to memory"
                )
            return
        if self.output_file_path is None and self.output_format in (
            OutputFormat.PARQUET,
            OutputFormat.PARQUET_SNAPPY,
        ):
            raise InvalidOutputDestination("parquet format can output to only a file")


@dataclass(frozen=True)
class QuerySetting:
    use_cache: bool = True
    force_sync_cloud: bool = False


@dataclass(frozen=True)
class SearchMetricsQuery:
    """Reference InterpretedQueryCondition (lexer/mod.rs:179-188)."""

    database: str | None
    metrics: str
    field_selectors: tuple[int, ...] | None  # None == select *
    field_names: tuple[str, ...] | None  # ts-prepended, None == positional
    condition: SearchCondition
    output_condition: OutputCondition
    format_datetime: bool
    timezone: TimeZoneAndOffset
    setting: QuerySetting


@dataclass(frozen=True)
class ListMetricsQuery:
    database: str | None
    output_condition: OutputCondition
    setting: QuerySetting


@dataclass(frozen=True)
class DescribeMetricsQuery:
    database: str | None
    output_condition: OutputCondition
    metrics_filter: str | None
    block_list: bool  # False -> .describe, True -> .block_list
    setting: QuerySetting


InterpretedQuery = SearchMetricsQuery | ListMetricsQuery | DescribeMetricsQuery

_BUILTIN_METRICS = {".metrics", ".describe", ".block_list"}


def resolve_value_nanos(
    value: DatetimeValue, offset_seconds: int, now_utc_nanos: int
) -> int:
    """Port of DatetimeFilterValue::to_timestamp_nano
    (datetime_filter_parser.rs:122-154): literals are naive wall-clock
    + delta, then interpreted in the effective tz; builtin functions
    resolve to tz-local midnight instants, then + delta."""
    if value.literal_nanos is not None:
        naive = value.literal_nanos + value.delta_micros * 1_000
        return naive - offset_seconds * NANOS_PER_SEC
    fn = value.function
    assert fn is not None
    if fn is BuildinDatetimeFunction.TODAY:
        base = today_nanos(offset_seconds, now_utc_nanos)
    elif fn is BuildinDatetimeFunction.YESTERDAY:
        base = yesterday_nanos(offset_seconds, now_utc_nanos)
    else:
        base = tomorrow_nanos(offset_seconds, now_utc_nanos)
    return base + value.delta_micros * 1_000


def compile_datetime_filter(
    flt: DatetimeFilter, offset_seconds: int, now_utc_nanos: int
) -> SearchCondition:
    """Port of datetime_filter_to_condition (lexer/where.rs:19-77)."""
    v1 = resolve_value_nanos(flt.value1, offset_seconds, now_utc_nanos)
    if flt.op is FilterOp.IN:
        assert flt.value2 is not None
        v2 = resolve_value_nanos(flt.value2, offset_seconds, now_utc_nanos)
        return SearchCondition(v1, v2)
    if flt.op is FilterOp.GTE:
        limit = SearchLimit(LimitKind.HEAD, flt.limit) if flt.limit is not None else None
        return SearchCondition(v1, None, limit)
    if flt.op is FilterOp.GT:
        limit = SearchLimit(LimitKind.HEAD, flt.limit) if flt.limit is not None else None
        return SearchCondition(v1 + 1, None, limit)
    if flt.op is FilterOp.LTE:
        limit = SearchLimit(LimitKind.TAIL, flt.limit) if flt.limit is not None else None
        return SearchCondition(None, v1 + 1, limit)
    if flt.op is FilterOp.LT:
        limit = SearchLimit(LimitKind.TAIL, flt.limit) if flt.limit is not None else None
        return SearchCondition(None, v1, limit)
    # EQ: widen to the accuracy of the tz-local reading of the value
    # (lexer/where.rs:54-75).
    local = v1 + offset_seconds * NANOS_PER_SEC
    acc = accuracy_of_local_nanos(local)
    return SearchCondition(v1, v1 + acc.width_nanos)


def interpret(parsed: ParsedQuery, now_utc_nanos: int) -> InterpretedQuery:
    """Port of lexer interpret (lexer/mod.rs:198-263)."""
    wc = parsed.with_clause
    tz = (
        resolve_timezone(wc.timezone_name)
        if wc is not None and wc.timezone_name is not None
        else DEFAULT_TIMEZONE
    )
    output_format = (
        wc.output_format if wc is not None and wc.output_format is not None
        else OutputFormat.TABLE
    )
    output_condition = OutputCondition(
        output_format=output_format,
        output_to_memory=bool(wc and wc.output_to_memory),
        output_file_path=wc.output_file_path if wc else None,
    )
    output_condition.validate()
    setting = QuerySetting(
        use_cache=wc.use_cache if wc else True,
        force_sync_cloud=wc.force_sync_cloud if wc else False,
    )
    database = wc.database if wc else None

    if parsed.from_metrics in _BUILTIN_METRICS:
        metrics_filter = parsed.where.metrics_filter if parsed.where else None
        if parsed.from_metrics == ".metrics":
            if metrics_filter is not None:
                raise MetricsFilterIsNotSupported(
                    "allowed only on '.describe', '.block_list'"
                )
            return ListMetricsQuery(database, output_condition, setting)
        return DescribeMetricsQuery(
            database,
            output_condition,
            metrics_filter,
            block_list=(parsed.from_metrics == ".block_list"),
            setting=setting,
        )

    if parsed.from_metrics.startswith("."):
        raise InvalidMetrics(parsed.from_metrics)

    if parsed.where is not None and parsed.where.metrics_filter is not None:
        raise MetricsFilterIsNotSupported(
            "allowed only on '.describe', '.block_list'"
        )
    if parsed.where is None or parsed.where.datetime_filter is None:
        raise EmptyFilterCondition("you need at least one where condition")

    col_index = (
        {name: i for i, name in enumerate(wc.columns)}
        if wc is not None and wc.columns is not None
        else None
    )

    field_selectors: tuple[int, ...] | None
    field_names: tuple[str, ...] | None
    if parsed.select.star:
        field_selectors = None
        field_names = (
            ("ts", *wc.columns) if wc is not None and wc.columns is not None else None
        )
    else:
        if col_index is None:
            raise NoColumnDef(f"columns : {','.join(parsed.select.columns)}")
        selectors: list[int] = []
        names: list[str] = []
        for col in parsed.select.columns:
            if col == "ts":
                # Divergence from the reference (documented): its lexer
                # would raise NoColumnDef for `ts` (lexer/select.rs:36-50)
                # even though its own parser tests use `select ts, ...`
                # (parser/mod.rs:406-482). `ts` is always prepended to the
                # output anyway (lexer/mod.rs:190-228), so we accept and
                # skip it here.
                continue
            if col not in col_index:
                raise NoColumnDef(col)
            selectors.append(col_index[col])
            names.append(col)
        field_selectors = tuple(selectors)
        field_names = ("ts", *names)

    condition = compile_datetime_filter(
        parsed.where.datetime_filter, tz.offset_seconds, now_utc_nanos
    )

    return SearchMetricsQuery(
        database=database,
        metrics=parsed.from_metrics,
        field_selectors=field_selectors,
        field_names=field_names,
        condition=condition,
        output_condition=output_condition,
        format_datetime=wc.format_datetime if wc else True,
        timezone=tz,
        setting=setting,
    )
