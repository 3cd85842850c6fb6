"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001; `queries()` /
`oracle_sql()` expose the full operator suite (SURVEY.md §2 reference
surface + large-scale pipeline extensions) for the DuckDB correctness
gate. Implementation lives in zikeiretsu_rs_spark/suite.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zikeiretsu_rs_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly time-bucket
    aggregation over the events stream (nano spine, decimal-exact
    sums)."""
    return suite.q_agg_time_bucket_1h(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
