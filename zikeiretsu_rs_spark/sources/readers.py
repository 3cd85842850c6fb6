"""CSV / JSON-lines datapoint readers.

Input contract: a `ts` column (either epoch-nanos integer, or an
ISO-8601/`yyyy-MM-dd HH:mm:ss[.S]` string parsed at µs precision)
plus one column per field, mapped positionally onto the store's
declared field types. Output: the canonical block schema
(ts long nanos, f0..fn typed per FieldType) ready for
`WritableStore.persist_dataframe`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datamodel import (
    TS_COLUMN,
    FieldType,
    field_column_names,
    metrics_schema,
    nanos_spine_expr,
)


def _normalize(
    df: DataFrame, field_types: list[FieldType], field_cols: list[str] | None
) -> DataFrame:
    """Map (ts, user columns...) onto (ts nanos, f0..fn)."""
    if field_cols is None:
        field_cols = [c for c in df.columns if c != TS_COLUMN]
    if len(field_cols) != len(field_types):
        raise ValueError(
            f"{len(field_cols)} data columns for {len(field_types)} declared field types"
        )
    ts_dtype = dict(df.dtypes)[TS_COLUMN]
    if ts_dtype == "string":
        # Offset-carrying strings are instants (tz-free via unix_micros);
        # offset-LESS strings are naive wall clock and must parse via
        # to_timestamp_ntz so they share the naive-as-UTC semantics of
        # the NTZ/DATE paths regardless of spark.sql.session.timeZone
        # (to_timestamp would interpret them in the ambient session tz).
        has_offset = F.col(TS_COLUMN).rlike(r"(Z|z|[+-]\d{2}:?\d{2})$")
        instant = nanos_spine_expr(F.to_timestamp(F.col(TS_COLUMN)), "timestamp")
        naive = nanos_spine_expr(
            F.to_timestamp_ntz(F.col(TS_COLUMN)), "timestamp_ntz"
        )
        ts = F.when(has_offset, instant).otherwise(naive)
    else:
        ts = nanos_spine_expr(F.col(TS_COLUMN), ts_dtype)
    target = metrics_schema(field_types)
    names = field_column_names(len(field_types))
    cols = [ts.alias(TS_COLUMN)]
    for src, name in zip(field_cols, names):
        dtype = target[name].dataType.simpleString()
        cols.append(F.col(src).cast(dtype).alias(name))
    return df.select(*cols)


def read_datapoints_csv(
    spark: SparkSession,
    path: str,
    field_types: list[FieldType],
    field_cols: list[str] | None = None,
    header: bool = True,
) -> DataFrame:
    """Read a CSV dataset of datapoints into the block schema.
    `field_cols` selects/orders the data columns; default = every
    non-ts column in file order."""
    df = spark.read.option("header", str(header).lower()).csv(path)
    return _normalize(df, field_types, field_cols)


def read_datapoints_json(
    spark: SparkSession,
    path: str,
    field_types: list[FieldType],
    field_cols: list[str] | None = None,
) -> DataFrame:
    """Read a JSON-lines dataset of datapoints into the block schema."""
    df = spark.read.json(path)
    return _normalize(df, field_types, field_cols)
