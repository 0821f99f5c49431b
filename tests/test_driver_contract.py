"""Pin the driver-contract surface of __spark_entry__.

The per-round driver checks the FIRST 50 entries of ``queries()`` in
dict order (observed in CORRECTNESS_r01.json), so the ordering is
load-bearing. Round-3 policy (VERDICT r2 ask #1): bench headliners and
one §2-anchor per operator family stay fixed; the remaining slots
ROTATE to names that have never had a driver row, so the whole registry
accumulates hard oracle signal across rounds.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as e
from cc_pyspark_spark.plans import QUERIES

DRIVER_CAP = 50
REPO = pathlib.Path(__file__).resolve().parent.parent


def _previously_checked() -> set[str]:
    seen: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        seen |= set(json.loads(f.read_text()))
    return seen


def test_priority_names_all_registered():
    assert set(e.DRIVER_PRIORITY) <= set(QUERIES)
    assert len(set(e.DRIVER_PRIORITY)) == len(e.DRIVER_PRIORITY) == DRIVER_CAP


def test_rotation_brings_first_time_names():
    """≥15 of the 50 checked slots go to names with no prior driver row
    (so long as enough unchecked names remain in the registry)."""
    first = list(e.queries())[:DRIVER_CAP]
    prev = _previously_checked()
    never = set(QUERIES) - prev
    first_time = [n for n in first if n not in prev]
    want = min(15, len(never))
    assert len(first_time) >= want, (
        f"only {len(first_time)} first-time names in the driver window, "
        f"{len(never)} never-checked remain: rotate DRIVER_PRIORITY"
    )


def test_headliners_inside_driver_cap():
    """Fixed anchors: the DRIVER_CORE keeps permanent driver
    slots AND permanent bench slots; rotation only cycles the other 26.

    r8 (VERDICT r7 ask #1): the fixed block shrank from all 40+
    benched headliners to the fixed core so the fourteen
    never-driver-checked r7 queries fit in the window alongside a
    twelve-name r1 rotation block.  Benched-but-not-core names
    (sketches, funnel/retention, LM scoring, PQ rerank, RRF, prefix
    Jaccard, the graph pair, ...) hold r7-green rows and stay under
    the perf gate + sf0.001 parity pytest between driver rows."""
    first = set(list(e.queries())[:DRIVER_CAP])
    import bench

    assert set(e.DRIVER_CORE) <= first, sorted(set(e.DRIVER_CORE) - first)
    assert set(e.DRIVER_CORE) <= set(bench.HEADLINERS), (
        "core names must stay benched"
    )
    # every registered query with no prior driver row gets one this round
    never = set(QUERIES) - _previously_checked()
    assert never <= first, sorted(never - first)


def test_oracle_order_mirrors_query_order():
    q = list(e.queries())
    o = list(e.oracle_sql())
    assert [n for n in q if n in set(o)] == o


def test_every_query_has_oracle():
    # r7: 114/114 — the last rows-only query (agg_approx_count_distinct)
    # gained a within-bound boolean oracle; a regression here reopens the
    # driver window's one structural exception.
    rows_only = {n for n in e.queries() if n not in e.oracle_sql()}
    assert rows_only == set(), rows_only
