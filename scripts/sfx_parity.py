#!/usr/bin/env python
"""Above-gate-SF oracle parity as a per-round committed artifact
(r15, VERDICT r14 ask #4).

The r14 one-off sf0.1 spot-check (13/14 MATCH, one on-theory LSH
recall miss — SCALING.md "Cross-SF oracle parity spot-check (r14)")
was the most informative correctness result of that round; this
script turns it into a tripwire. It runs a varied query set through
the driver-style compare at an above-gate SF (default sf0.1) and
asserts the documented exception class NUMERICALLY instead of
hand-waving it:

* exact rows — canonical compare (sorted columns, repr-stringified,
  sorted rows), identical to tools/driver_sim.py;
* LSH-banded rows (``LSH_RECALL_BOUND``) — the all-pairs oracle is
  TRUTH, not the expected output, above the gate SF. For those:
  (a) precision is structural (every emitted pair is
      exact-Jaccard-verified), so spark ⊆ oracle is asserted
      exactly;
  (b) recall is gated against the geometry's own theory bound: with
      16 perms / 4 bands a pair of jaccard j is missed with
      probability (1 − j^4)^4, so observed misses must not exceed
      ``max(2, 3 × Σ(1 − j^4)^4)`` over the oracle's pair set —
      three expected-count slack plus a 2-pair floor for small
      fixtures. A NEW kind of non-match (a false positive, or
      recall below the band bound) fails the run.

Writes one JSON record (default ``sfx_parity_r{round}.json`` via
--out) with per-row status so the round artifact is diffable.

Usage:
  python scripts/sfx_parity.py [--sf DIR] [--out FILE] [name ...]

Exit 1 on any failure.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from tests.oracle_compare import assert_frames_match  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Varied default set — mirrors the r14 spot-check's spread (dedup,
#: session windows, cohorts, windows, rollups, TPC-H spine, text,
#: curation) plus BOTH LSH deployment rows for the recall gate.
DEFAULT_NAMES = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_volume",
    "dedup_exact",
    "dedup_url_canonical",
    "events_session_window",
    "events_retention_cohorts",
    "events_hypertable_rollup",
    "window_topn_per_group",
    "agg_count_by_key",
    "text_word_count_tfdf",
    "curation_domain_cap",
    "sim_bm25_topk",
    "graph_hits",
    "dedup_minhash_scale",
    "dedup_minhash_scale_capped",
)

#: Rows whose oracle is all-pairs TRUTH: above the gate SF, exact set
#: equality demands more than the LSH S-curve promises; gate recall
#: against the band bound instead (module docstring).
LSH_RECALL_BOUND = frozenset({
    "dedup_minhash_scale",
    "dedup_minhash_scale_capped",
})

#: Deployed minhash geometry (operators/dedup.py signature defaults:
#: 16 perms / 4 bands -> 4 rows per band). Re-derive the bound if the
#: geometry ever changes.
ROWS_PER_BAND = 4
N_BANDS = 4


def _lsh_gate(sp_rows, du_rows) -> dict:
    """Numeric recall gate for an LSH row. Pairs keyed (a_id, b_id);
    jac compared rounded to 12 places on the intersection."""
    sp = {(int(r[0]), int(r[1])): round(float(r[2]), 12) for r in sp_rows}
    du = {(int(r[0]), int(r[1])): round(float(r[2]), 12) for r in du_rows}
    false_pos = sorted(set(sp) - set(du))
    jac_diff = sorted(
        k for k in set(sp) & set(du) if sp[k] != du[k]
    )
    missed = sorted(set(du) - set(sp))
    expected_misses = sum(
        (1.0 - j**ROWS_PER_BAND) ** N_BANDS for j in du.values()
    )
    allowed = max(2.0, 3.0 * expected_misses)
    ok = not false_pos and not jac_diff and len(missed) <= allowed
    return {
        "status": "RECALL_OK" if ok else "RECALL_FAIL",
        "n_true": len(du),
        "n_found": len(sp),
        "n_missed": len(missed),
        "missed_pairs": [list(p) for p in missed[:10]],
        "missed_jacs": [du[p] for p in missed[:10]],
        "false_positives": [list(p) for p in false_pos[:10]],
        "jac_mismatches": [list(p) for p in jac_diff[:10]],
        "expected_misses": round(expected_misses, 3),
        "allowed_misses": round(allowed, 3),
        "recall": round(1 - len(missed) / len(du), 6) if du else 1.0,
    }


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    out = "sfx_parity_r15.json"
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        elif argv[i] == "--out":
            out = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    names = names or list(DEFAULT_NAMES)

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("sfx-parity")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    queries = e.queries()
    oracles = e.oracle_sql()
    results: dict[str, dict] = {}
    n_bad = 0
    for name in names:
        try:
            spdf = queries[name](spark, sf).toPandas()
            ddf = con.sql(oracles[name]).df()
            if name in LSH_RECALL_BOUND:
                res = _lsh_gate(spdf.values.tolist(), ddf.values.tolist())
            else:
                assert_frames_match(spdf, ddf, name)
                res = {"status": "MATCH", "rows": len(spdf)}
                if len(spdf) == 0:
                    res["status"] = "MATCH_EMPTY"
        except Exception as ex:  # noqa: BLE001
            res = {"status": "ERROR", "error": str(ex)[:500]}
        results[name] = res
        print(f"{name}: {res['status']}"
              + (f" ({res.get('rows', res.get('n_found'))} rows)"
                 if "error" not in res else f" — {res['error'][:120]}"))
        if res["status"] in ("RECALL_FAIL", "ERROR", "MATCH_EMPTY"):
            n_bad += 1

    record = {
        "sf_dir": sf,
        "n_queries": len(names),
        "n_bad": n_bad,
        "lsh_geometry": {"rows_per_band": ROWS_PER_BAND, "bands": N_BANDS},
        "results": results,
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"\nsummary: {len(names)} queries, {n_bad} bad -> {out}")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
