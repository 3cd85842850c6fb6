"""Error taxonomy mirroring the reference's error enums.

Reference: zikeiretsu/src/tsdb/query/lexer/mod.rs:20-65 (LexerError,
OutputError), zikeiretsu/src/tsdb/query/parser/mod.rs (ParserError),
zikeiretsu/src/tsdb/datetime/util.rs:9-16 (DatetimeUtilError).
"""

from __future__ import annotations


class ZikeiretsuError(Exception):
    """Base class for all engine errors."""


class ParserError(ZikeiretsuError):
    """Query text failed to parse (reference: ParserError)."""


class InvalidDatetimeFormat(ParserError):
    """Reference: DatetimeUtilError::InvalidDatetimeFormat."""


class InvalidDatetimeFilterOperator(ParserError):
    """Reference: ParserError::InvalidDatetimeFilterOperator."""


class LexerError(ZikeiretsuError):
    """Analysis ("lexer") stage error (reference: LexerError)."""


class NoSelect(LexerError):
    """Reference: LexerError::NoSelect."""


class NoFrom(LexerError):
    """Reference: LexerError::NoFrom."""


class NoColumnDef(LexerError):
    """select of named columns without a `with cols = [...]` definition.

    Reference: LexerError::NoColumnDef (lexer/mod.rs:34-35,
    lexer/select.rs:23-48).
    """


class InvalidColumnDefinition(LexerError):
    """Reference: LexerError::InvalidColumnDefinition."""


class EmptyFilterCondition(LexerError):
    """Data queries require a WHERE clause.

    Reference: LexerError::EmptyFilterCondition (lexer/mod.rs:230-235).
    """


class MetricsFilterIsNotSupported(LexerError):
    """`where metrics = x` is only valid for `.describe` / `.block_list`.

    Reference: LexerError::MetricsFilterIsNotSupported (lexer/mod.rs:339-348).
    """


class InvalidMetrics(LexerError):
    """Metrics names must not start with '.' (reference: metrics.rs:6-20)."""


class OutputError(ZikeiretsuError):
    """Output condition validation error (reference: OutputError)."""


class InvalidOutputDestination(OutputError):
    """Parquet can only go to a file (reference: lexer/mod.rs:128-141)."""


class InvalidOutputFormat(OutputError):
    """Memory output must be table format (reference: lexer/mod.rs:120-125)."""


class CannotOutputToFile(OutputError):
    """output_to_memory and output_file are mutually exclusive
    (reference: lexer/mod.rs:146-149)."""


class StorageError(ZikeiretsuError):
    """Ingest / warehouse errors."""


class UnsupportedFieldType(StorageError):
    """Reference persists only Float64 and Bool
    (block/write.rs:89-91); the rebuild supports the full FieldType enum
    but keeps this error for API parity when validation is requested."""
