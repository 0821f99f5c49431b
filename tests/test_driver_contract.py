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
    """Fixed anchors: every benched query keeps a permanent driver
    slot, and queries whose semantics changed this round must get a
    fresh driver row; rotation only cycles the remaining slots.

    r7: the former §2-family anchors (scan_filter_project,
    sql_passthrough, multimodal_blob_stats, events_asof_join,
    events_range_join) hold r6-green rows and ceded their slots to the
    r1/r2 rotation block (VERDICT r6 ask #3); their families stay
    covered by the benched headliners + pytest."""
    first = set(list(e.queries())[:DRIVER_CAP])
    import bench

    must_have = set(bench.HEADLINERS)
    must_have |= {
        # changed in r7 — 64-bit SimHash banding, the composed full
        # pipeline, the format("warc") DataSource path, and the new
        # within-bound HLL oracle all need fresh driver rows
        "dedup_simhash_pairs",
        "curation_pipeline_full",
        "warc_source_payload_digest",
        "agg_approx_count_distinct",
        # r7 rotation block representatives (stalest rows: r1/r2)
        "tpch_q2_min_cost_supplier",
        "tpch_q13_customer_distribution",
        "tpch_q17_small_quantity_revenue",
        "tpch_q21_waiting_supplier",
        # first driver row for the bit-exact iterative-PageRank oracle
        # (tpch_q22 cedes its rotation slot; r2-green, rotates in r8)
        "graph_pagerank",
    }
    assert must_have <= first, sorted(must_have - first)


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
