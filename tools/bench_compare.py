"""Round-over-round bench comparison from COMMITTED full artifacts
(VERDICT r05 'what's wrong' #2: headline claims must be computable
from the repo alone). Usage:

    python tools/bench_compare.py BENCH_r05_full.json BENCH_r06_full.json

Prints the common-query total ratio, per-query movers beyond the
documented ambient variance band, and queries present on one side
only. Works with any two files bench.py wrote via
SPARK_GRAFT_BENCH_FULL / BENCH_full_latest.json.
"""

from __future__ import annotations

import json
import sys

VARIANCE_BAND = 1.4  # CHANGES_r04: sub-2.3s queries swing 1.25-1.4x ambient


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    ta = sum(qa[q] for q in common)
    tb = sum(qb[q] for q in common)
    print(f"common queries: {len(common)}")
    if ta > 0:
        print(f"  {sys.argv[1]}: {ta:.1f}s   {sys.argv[2]}: {tb:.1f}s   "
              f"ratio {tb / ta:.3f}x")
    else:
        print("  no common timed queries — only dropped/new sections apply")
    movers = []
    for q in common:
        va, vb = qa[q], qb[q]
        r = vb / va if va else float("inf")
        if r > VARIANCE_BAND or r < 1 / VARIANCE_BAND:
            movers.append((r, q, va, vb))
    for r, q, va, vb in sorted(movers):
        tag = "WIN " if r < 1 else "SLOW"
        print(f"  {tag} {q}: {va:.2f} -> {vb:.2f}  ({r:.2f}x)")
    if only_a:
        print(f"dropped: {only_a}")
    if only_b:
        print(f"new: {only_b} "
              f"({sum(qb[q] for q in only_b):.1f}s)")
    for section in ("skew", "layout", "ann"):
        sa, sb = a.get(section), b.get(section)
        if sa and sb:
            keys = sorted(set(sa) & set(sb))
            diffs = [
                f"{k}: {sa[k]} -> {sb[k]}"
                for k in keys
                if isinstance(sa[k], (int, float))
                and isinstance(sb[k], (int, float))
                and sa[k]
                and not (1 / VARIANCE_BAND < sb[k] / sa[k] < VARIANCE_BAND)
            ]
            if diffs:
                print(f"{section}: " + "; ".join(diffs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
