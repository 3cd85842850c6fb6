"""Round-over-round bench comparison from COMMITTED full artifacts
(VERDICT r05 'what's wrong' #2: headline claims must be computable
from the repo alone). Usage:

    python tools/bench_compare.py PREV_full.json RUN1.json [RUN2.json ...]

PREV is the previous round's committed artifact; RUN1.. are this
round's named runs, FIRST of which is the committed pick. Prints the
common-query total ratio (prev vs committed pick), per-query movers
beyond the documented ambient variance band, and queries present on
one side only.

Mover classification (VERDICT r09 item 4 — the committed-vs-committed
blind spot): a query beyond band against PREV in EVERY named run of
the round is real (SLOW REGRESSION / WIN CONFIRMED); beyond band only
in the committed pick (or a strict subset of runs) is run NOISE baked
into the min-pick artifact — and that applies to WINS too: under a
min-of-runs protocol a phantom speedup is the MOST likely noise
direction, so an unconfirmed WIN must not flow into headline claims.
With a single run the tag is ?UNCONFIRMED — one run cannot
distinguish the two.

Exit codes (ADVICE r09): 0 = clean comparison; 3 = a measured ambient
band exceeded the MAX_BAND clamp, so the run itself is untrustworthy —
scripted callers must not consume deltas from a nonzero exit. A
machine-readable summary JSON line (prefix `bench_compare:`) carries
the same flag.
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
# problem, not the queries; warn, clamp, and exit nonzero


def _band_of(art: dict) -> float | None:
    return (art.get("ambient") or {}).get("band")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    prev = json.load(open(sys.argv[1]))
    runs = [(p, json.load(open(p))) for p in sys.argv[2:]]
    committed_path, committed = runs[0]

    bands = [_band_of(prev)] + [_band_of(r) for _, r in runs]
    band_exceeded = False
    if all(b is not None for b in bands):
        measured = max(bands)
        variance_band = min(max(measured, MIN_BAND), MAX_BAND)
        print(f"ambient band (measured, widest of {len(bands)} runs): "
              f"{measured:.3f}x -> mover threshold {variance_band:.3f}x")
        if measured > MAX_BAND:
            band_exceeded = True
            print(f"  WARNING: measured band {measured:.3f}x exceeds the "
                  f"{MAX_BAND}x clamp — at least one run was taken under "
                  "heavy load; re-measure before trusting ANY delta here "
                  "(exit 3)")
    else:
        variance_band = FALLBACK_BAND
        print(f"ambient band: not recorded in every run -> fallback "
              f"threshold {variance_band}x")

    qp, qc = prev["queries"], committed["queries"]
    common = sorted(set(qp) & set(qc))
    only_prev = sorted(set(qp) - set(qc))
    only_cur = sorted(set(qc) - set(qp))
    tp = sum(qp[q] for q in common)
    tc = sum(qc[q] for q in common)
    print(f"common queries: {len(common)}")
    if tp > 0:
        print(f"  {sys.argv[1]}: {tp:.1f}s   {committed_path}: {tc:.1f}s   "
              f"ratio {tc / tp:.3f}x")
    else:
        print("  no common timed queries — only dropped/new sections apply")

    def _beyond(va: float, vb: float) -> bool:
        r = vb / va if va else float("inf")
        return r > variance_band or r < 1 / variance_band

    n_regressions = 0
    movers = []
    for q in common:
        va, vb = qp[q], qc[q]
        if va == 0:
            # a zero baseline makes every nonzero current value an
            # inf-ratio "mover" — that is an artifact-shape question
            # (instant or unmeasured query in PREV), not a perf delta
            # (judged ADVICE r10); surface it, never classify it
            if vb != 0:
                print(f"  ZERO-BASELINE {q}: {va} -> {vb:.2f} "
                      "(ratio undefined; excluded from movers)")
            continue
        if not _beyond(va, vb):
            continue
        r = vb / va
        # the blind spot: check the SAME prev-vs-run delta in every
        # named run of the round, not just the committed pick —
        # in BOTH directions (a min-pick artifact manufactures
        # phantom WINs at least as easily as phantom SLOWs)
        others = [
            rn["queries"][q]
            for _, rn in runs[1:]
            if q in rn.get("queries", {})
        ]
        n_missing = len(runs) - 1 - len(others)
        slower = r > 1
        if not others:
            # one run can't split noise from a real move
            tag = ("SLOW" if slower else "WIN") + "?UNCONFIRMED"
        elif all(
            _beyond(va, v) and ((v > va) == slower) for v in others
        ):
            tag = "SLOW REGRESSION" if slower else "WIN CONFIRMED"
            if n_missing:
                # partial coverage must not read as full confidence
                # (judged ADVICE r10): say exactly how many runs the
                # confirmation actually rests on
                tag += (f" (confirmed in {len(others) + 1}/"
                        f"{len(runs)} runs; {n_missing} run(s) "
                        "missing the query)")
            if slower:
                n_regressions += 1
        else:
            tag = ("SLOW" if slower else "WIN") + " NOISE"
        movers.append((r, q, va, vb, tag, others))
    for r, q, va, vb, tag, others in sorted(movers):
        extra = (
            "  (other runs: "
            + ", ".join(f"{v:.2f}" for v in others) + ")"
            if others
            else ""
        )
        print(f"  {tag} {q}: {va:.2f} -> {vb:.2f}  ({r:.2f}x){extra}")
    if only_prev:
        print(f"dropped: {only_prev}")
    if only_cur:
        print(f"new: {only_cur} "
              f"({sum(qc[q] for q in only_cur):.1f}s)")
    for section in ("skew", "layout", "ann"):
        sa, sb = prev.get(section), committed.get(section)
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
    print("bench_compare: " + json.dumps({
        "band_exceeded": band_exceeded,
        "threshold": round(variance_band, 3),
        "n_runs": len(runs),
        "n_movers": len(movers),
        "n_regressions": n_regressions,
        "total_ratio": round(tc / tp, 3) if tp else None,
    }))
    return 3 if band_exceeded else 0


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
