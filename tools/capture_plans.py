"""Capture .explain('formatted') for named queries into a directory,
plus a one-line shape summary (Exchange / Generate / Scan / Python-eval
counts) per query. Usage:

    python tools/capture_plans.py OUT_DIR [sf_dir] name [name ...]

Analysis-only: builds each DataFrame and formats its plan; queries
whose BUILD runs driver actions (iterative operators) still execute
those, so keep heavy iterative rows out unless needed.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zikeiretsu_rs_spark import suite  # noqa: E402
from zikeiretsu_rs_spark.session import get_spark  # noqa: E402


def shape(plan: str) -> str:
    c = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "Gen": len(re.findall(r"\bGenerate\b", plan)),
        "Scan": len(re.findall(r"Scan parquet", plan)),
        "SMJ": len(re.findall(r"SortMergeJoin", plan)),
        "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
        "Py": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas", plan)
        ),
        "Win": len(re.findall(r"\bWindow\b", plan)),
        "Sort": len(re.findall(r"\bSort \[", plan)),
    }
    return " ".join(f"{k}={v}" for k, v in c.items())


def main() -> int:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    for name in names:
        try:
            df = suite.QUERIES[name](spark, sf_dir)
            # supported surface only (judged ADVICE r14 low: the former
            # df._sc/_jdf/PythonSQLUtils path is classic-only private
            # API — absent under Spark Connect and already shifted
            # across 4.x); explain(mode=...) works on both backends
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}")
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"OK    {name}: {shape(plan)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
