"""Parsed-query IR (reference: `ParsedQuery` and clause structs,
zikeiretsu/src/tsdb/query/parser/mod.rs:97-102,
parser/clause/*.rs, parser/parts/datetime_filter_parser.rs:8-16,116-120).

Datetime deltas: the reference models FixedOffset / MicroSec / Composit
variants that all collapse through `as_micro_second()`
(datetime_filter_parser.rs:103-113); we store the collapsed microsecond
value directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class BuildinDatetimeFunction(Enum):
    TODAY = "today"
    YESTERDAY = "yesterday"
    TOMORROW = "tomorrow"


@dataclass(frozen=True)
class DatetimeValue:
    """Either a datetime literal (naive nanos) or a builtin function,
    plus an accumulated delta in microseconds.

    Reference: DatetimeFilterValue (datetime_filter_parser.rs:116-120).
    """

    literal_nanos: int | None = None  # naive wall-clock nanos (DateString)
    function: BuildinDatetimeFunction | None = None
    delta_micros: int = 0

    def with_extra_delta(self, micros: int) -> "DatetimeValue":
        return DatetimeValue(self.literal_nanos, self.function, self.delta_micros + micros)


class FilterOp(Enum):
    IN = "in"
    GTE = ">="
    GT = ">"
    LTE = "<="
    LT = "<"
    EQ = "="


@dataclass(frozen=True)
class DatetimeFilter:
    """Reference: DatetimeFilter enum (datetime_filter_parser.rs:8-16).
    `limit` only for Gte/Gt (head) and Lte/Lt (tail)."""

    op: FilterOp
    value1: DatetimeValue
    value2: DatetimeValue | None = None
    limit: int | None = None


class OutputFormat(Enum):
    TABLE = "table"
    JSON = "json"
    PARQUET = "parquet"
    PARQUET_SNAPPY = "parquet_snappy"


@dataclass
class WithClause:
    """Reference: WithClause (parser/clause/with_clause.rs:17-27);
    format_datetime defaults true, use_cache true, force_sync_cloud false."""

    columns: list[str] | None = None
    database: str | None = None
    timezone_name: str | None = None
    output_format: OutputFormat | None = None
    output_file_path: str | None = None
    output_to_memory: bool = False
    format_datetime: bool = True
    use_cache: bool = True
    force_sync_cloud: bool = False


@dataclass
class SelectClause:
    star: bool = False
    columns: list[str] = field(default_factory=list)


@dataclass
class WhereClause:
    datetime_filter: DatetimeFilter | None = None
    metrics_filter: str | None = None


@dataclass
class ParsedQuery:
    select: SelectClause
    from_metrics: str
    with_clause: WithClause | None = None
    where: WhereClause | None = None
