"""Driver-gate freshness: rotation debt is a red test, not a judge note.

The driver's correctness gate hashes the FIRST 50 queries declared in
``zikeiretsu_rs_spark.suite.QUERIES`` each round (empirical: every
CORRECTNESS_r*.json has rows for exactly queries[0:50] in declaration
order).  The r07 verdict flagged 9 queries whose newest driver row was
four rounds stale; this test makes that class of debt impossible to
accumulate silently.

Rule: for every declared query, ``lag = newest_artifact_round -
newest_row_round`` (a query with no driver row at all has infinite
lag).  A query with ``lag >= MAX_LAG`` must be in the CURRENT head-50 —
i.e. scheduled to receive a fresh row in the next driver artifact.

Capacity proof for MAX_LAG = 5 (set in r09, per the r08 verdict —
MAX_LAG = 4 was arithmetically unsustainable already at 166 queries):
a query refreshed in round r must be re-slotted no later than the head
for round r+4 (its row reaches lag 4 when artifact r+4 lands; the head
declared then refreshes it in r+5, before lag hits MAX_LAG=5 with a
stale-and-unscheduled state).  So every query needs a head slot at
least once per 4 driver rounds: steady-state demand at the current
170-query catalog (169 after the r09 debuts + 1 r10 debut; suite.py's
QUERIES comment restates the same arithmetic) =
ceil(170 / 4) = 43 <= 50 = HEAD slots per round, leaving ~7 spare
slots/round for newly declared queries.  At MAX_LAG = 4 the demand
would be ceil(170 / 3) = 57 > 50 — structurally unretirable, which is
exactly what these tests turned red on when CORRECTNESS_r08.json
landed (then at 166: ceil(166 / 3) = 56 > 50).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MAX_LAG = 5
HEAD = 50


def _driver_artifacts() -> dict[int, dict]:
    out = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:  # skip CORRECTNESS_LOCAL_* (local gate, not the driver's)
            continue
        out[int(m.group(1))] = json.loads(p.read_text())
    return out


def test_head50_covers_every_stale_query():
    from zikeiretsu_rs_spark.suite import QUERIES

    artifacts = _driver_artifacts()
    assert artifacts, "no CORRECTNESS_r*.json committed"
    newest_round = max(artifacts)

    newest_row: dict[str, int] = {}
    for rnd, rows in artifacts.items():
        for name in rows:
            newest_row[name] = max(newest_row.get(name, 0), rnd)

    head = set(list(QUERIES)[:HEAD])
    stale_unscheduled = sorted(
        name
        for name in QUERIES
        if newest_round - newest_row.get(name, -(10**6)) >= MAX_LAG
        and name not in head
    )
    assert not stale_unscheduled, (
        f"queries with a driver row >= {MAX_LAG} rounds stale (newest "
        f"artifact r{newest_round:02d}) that are NOT in the current "
        f"head-50 rotation: {stale_unscheduled} — reorder "
        "zikeiretsu_rs_spark/suite.py QUERIES so they lead the head."
    )


def test_rotation_debt_fits_next_head():
    """Tail queries that will cross the staleness bar after the NEXT
    driver artifact (current lag >= MAX_LAG - 1) must fit in one head-50
    rotation — otherwise the debt is structurally unretirable and the
    catalog has outgrown the gate window."""
    from zikeiretsu_rs_spark.suite import QUERIES

    artifacts = _driver_artifacts()
    newest_round = max(artifacts)
    newest_row: dict[str, int] = {}
    for rnd, rows in artifacts.items():
        for name in rows:
            newest_row[name] = max(newest_row.get(name, 0), rnd)

    tail = list(QUERIES)[HEAD:]
    due_next = [
        n for n in tail
        if newest_round - newest_row.get(n, -(10**6)) >= MAX_LAG - 1
    ]
    assert len(due_next) <= HEAD, (
        f"{len(due_next)} tail queries come due next round but only "
        f"{HEAD} head slots exist — the rotation can no longer keep up: "
        f"{due_next}"
    )
