"""End-of-round evidence recorder — one command that regenerates every
committed artifact AFTER the round's last code change, so claims and
records can't drift (the r04/r05 lesson, made mechanical):

    python tools/record_round.py 7 [--skip-tests] [--skip-bench]

Sequence (each step prints PASS/FAIL; a FAIL stops the run):
  1. full pytest (685+ tests)                      [--skip-tests]
  2. oracle gate sf0.01 -> CORRECTNESS_LOCAL_r{N}.json
  3. oracle gate sf0.1  -> CORRECTNESS_LOCAL_r{N}_sf0.1.json
  4. bench sf0.1        -> BENCH_r{N}_full.json    [--skip-bench]
  5. doc-count gate (tests/test_doc_counts.py) — fails if CHANGES/
     README/SCALE still claim stale query/test counts

Commit the resulting artifacts as the round's final commit.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, cwd=REPO, **kw)


def main() -> int:
    args = sys.argv[1:]
    flags = {a for a in args if a.startswith("--")}
    pos = [a for a in args if not a.startswith("--")]
    if not pos:
        print(__doc__)
        return 2
    n = int(pos[0])
    py = sys.executable

    if "--skip-tests" not in flags:
        if run([py, "-m", "pytest", "tests/", "-q"]).returncode:
            print("FAIL: pytest")
            return 1
        print("PASS: pytest")

    for sf, out in (
        ("/root/testdata/sf0.01", f"CORRECTNESS_LOCAL_r{n:02d}.json"),
        ("/root/testdata/sf0.1", f"CORRECTNESS_LOCAL_r{n:02d}_sf0.1.json"),
    ):
        if run([py, "tools/check_oracle.py", "--json", out, sf]).returncode:
            print(f"FAIL: oracle gate {sf}")
            return 1
        d = json.load(open(os.path.join(REPO, out)))["results"]
        bad = [
            k for k, v in d.items()
            if v.get("hash_match") is False or v.get("rows_match") is False
        ]
        if bad:
            print(f"FAIL: {out}: red rows {bad}")
            return 1
        print(f"PASS: {out} ({len(d)} queries green)")

    if "--skip-bench" not in flags:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
        if run([py, "bench.py"], env=env,
               stdout=subprocess.DEVNULL).returncode:
            print("FAIL: bench")
            return 1
        # copy from the SF-stamped record (bench.py writes it always;
        # "latest" only on explicit SPARK_GRAFT_SF_DIR) so the round
        # artifact provably came from an sf0.1 run
        shutil.copy(
            os.path.join(REPO, "BENCH_full_sf0.1.json"),
            os.path.join(REPO, f"BENCH_r{n:02d}_full.json"),
        )
        print(f"PASS: BENCH_r{n:02d}_full.json")

    if run([py, "-m", "pytest", "tests/test_doc_counts.py", "-q"]).returncode:
        print("FAIL: doc-count gate — update CHANGES/README/SCALE counts")
        return 1
    print("PASS: doc-count gate")
    print(f"round {n} artifacts recorded — commit them as the final commit")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
