"""Plan audit: print the formatted physical plan of suite queries and
flag scale hazards (missing pushdown, cartesian products, un-keyed
windows). The automated version of this audit runs in
tests/test_plan_shape.py; this tool is for eyeballing a specific
query's plan while iterating.

Usage:
    python tools/explain_audit.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zikeiretsu_rs_spark import suite  # noqa: E402
from zikeiretsu_rs_spark.session import get_spark  # noqa: E402


def audit(plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN PRODUCT")
    if "PushedFilters: []" in plan:
        flags.append("scan with no pushed filters")
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        if "ASC NULLS FIRST" in m.group(1).split(",")[0]:
            flags.append(f"un-keyed window: {m.group(1)[:60]}")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(suite.QUERIES)
    spark = get_spark(app_name="explain-audit", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    verbose = len(names) <= 3
    for name in names:
        df = suite.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        flags = audit(plan)
        marker = " !! " + "; ".join(flags) if flags else " ok"
        print(f"== {name}{marker}")
        if verbose:
            print(plan)


if __name__ == "__main__":
    main()
