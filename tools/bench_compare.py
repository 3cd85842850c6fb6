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

FALLBACK_BAND = 1.4  # CHANGES_r04: sub-2.3s queries swing 1.25-1.4x ambient
MIN_BAND = 1.25  # the probe records the per-query-worst spread between its
# two passes; individual short queries historically swing up to ~1.25x on
# a quiet machine, so never flag below that floor
MAX_BAND = 1.6  # and never let one noisy probe query silently disable
# mover detection for the whole comparison — past this the RUN is the
# problem, not the queries; warn and clamp


def _measured_band(*artifacts) -> float | None:
    """The wider of the two runs' recorded ambient bands (bench.py
    'ambient' section, VERDICT r08 item 5), or None if either run
    predates the probe."""
    bands = []
    for art in artifacts:
        band = (art.get("ambient") or {}).get("band")
        if band is None:
            return None
        bands.append(band)
    return max(bands)


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    measured = _measured_band(a, b)
    if measured is not None:
        variance_band = min(max(measured, MIN_BAND), MAX_BAND)
        print(f"ambient band (measured, wider run): {measured:.3f}x "
              f"-> mover threshold {variance_band:.3f}x")
        if measured > MAX_BAND:
            print(f"  WARNING: measured band {measured:.3f}x exceeds the "
                  f"{MAX_BAND}x clamp — at least one run was taken under "
                  "heavy load; re-measure before trusting ANY delta here")
    else:
        variance_band = FALLBACK_BAND
        print(f"ambient band: not recorded in both runs -> fallback "
              f"threshold {variance_band}x")
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
        if r > variance_band or r < 1 / variance_band:
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
                and not (1 / variance_band < sb[k] / sa[k] < variance_band)
            ]
            if diffs:
                print(f"{section}: " + "; ".join(diffs))
    return 0


if __name__ == "__main__":
    try:
        rc = main()
        sys.stdout.flush()
    except BrokenPipeError:  # `bench_compare ... | head` is routine
        # point stdout at devnull so interpreter shutdown's buffer
        # flush doesn't hit EPIPE again outside this handler (the
        # documented Python SIGPIPE recipe)
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        rc = 0
    raise SystemExit(rc)
