"""Local replica of the driver's correctness gate: run every
queries() entry and its oracle_sql() on the same sf dir, compare
row-count + sorted-column value content. Usage:

    python tools/check_oracle.py [--json OUT.json] [sf_dir] [name ...]

With --json, writes a CORRECTNESS-style artifact covering ALL declared
queries (the driver's own gate checks only the first 50 declared; the
committed CORRECTNESS_LOCAL_r*.json artifacts cover the tail).
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as entry
    from zikeiretsu_rs_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, osql = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = results[name] = {
            "rows_match": None,
            "schema_match": None,
            "value_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            rec["err"] = f"spark: {e}"[:300]
            failures.append(name)
            continue
        if name not in osql:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            rec["err"] = "no_oracle"
            continue
        try:
            odf = con.execute(osql[name]).df()
            rec["oracle_rows"] = len(odf)
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            rec["err"] = f"oracle: {e}"[:300]
            failures.append(name)
            continue
        rec["rows_match"] = len(sdf) == len(odf)
        if not rec["rows_match"]:
            print(f"FAIL  {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures.append(name)
            continue
        rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        if not rec["schema_match"]:
            print(
                f"FAIL  {name}: columns spark={sorted(sdf.columns)} "
                f"oracle={sorted(odf.columns)}"
            )
            failures.append(name)
            continue
        a, b = normalize(sdf), normalize(odf)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            rec["value_match"] = True
            print(f"OK    {name}: {len(sdf)} rows")
        except AssertionError as e:
            rec["value_match"] = False
            print(f"FAIL  {name}: value mismatch: {str(e)[:300]}")
            failures.append(name)
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
        print(f"wrote {json_out}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
