"""Output stage: table / JSON / Parquet writers + destination routing.

Reference: query/executor/output/{format,writer}/*.rs and the
validation matrix in lexer/mod.rs:112-177 (enforced at analysis time by
OutputCondition.validate; re-checked here).

Shape parity:
- table: pretty text table (TableDfOutput, table_format.rs:7-14).
- json: COLUMN-oriented dict {col: [values...]} (JsonDfOutput,
  json_format.rs:6-24) — not row-oriented lines, so `df.write.json` is
  wrong here; results at this point are query outputs (small by
  construction of the dialect), so a toPandas collect is appropriate.
- parquet / parquet_snappy: file write (parquet_format.rs:8-29).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..errors import InvalidOutputDestination
from .analyzer import OutputCondition
from .ast import OutputFormat


def render_table(df: DataFrame) -> str:
    pdf = df.toPandas()
    return pdf.to_string(index=False)


def render_json(df: DataFrame) -> str:
    pdf = df.toPandas()
    return json.dumps({c: pdf[c].tolist() for c in pdf.columns}, default=str)


def write_output(df: DataFrame, cond: OutputCondition) -> str | DataFrame | None:
    """Execute the output condition. Returns the rendered string for
    stdout formats, the DataFrame for memory output, None for file
    writes."""
    cond.validate()
    if cond.output_to_memory:
        return df

    fmt = cond.output_format
    path = cond.output_file_path

    if fmt in (OutputFormat.PARQUET, OutputFormat.PARQUET_SNAPPY):
        if path is None:
            raise InvalidOutputDestination("parquet format can output to only a file")
        compression = "snappy" if fmt is OutputFormat.PARQUET_SNAPPY else "none"
        df.write.mode("overwrite").option("compression", compression).parquet(path)
        return None

    rendered = render_json(df) if fmt is OutputFormat.JSON else render_table(df)
    if path is not None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(rendered)
        return None
    return rendered
