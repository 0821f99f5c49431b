#!/usr/bin/env python
"""Mechanical round-over-round bench comparison (r13, VERDICT r12 ask
#2's reporting half): given two bench records, print the common-set
totals raw AND calibration-normalized, the per-query ratio band, and
the movers that exceed their own recorded spread — the drift-vs-signal
call that previously took a hand A/B.

Usage:
  python scripts/compare_bench.py OLD.json NEW.json [--hf-old X]

Records written before r13 carry no host_factor; supply one with
--hf-old (e.g. 1.33 for the r12 record, per SCALING.md's hand A/B) or
the old side is reported raw-only.
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        raise SystemExit(f"{path}: not a bench record (no 'queries')")
    return d


def main() -> None:
    argv = sys.argv[1:]
    hf_old = None
    args: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--hf-old":
            hf_old = float(argv[i + 1])
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = _load(args[0]), _load(args[1])
    hand_supplied = hf_old is not None and "host_factor" not in old
    hf_old = hf_old if hf_old is not None else old.get("host_factor")
    hf_new = new.get("host_factor")
    if hand_supplied:
        print(
            "CAVEAT: --hf-old is a hand-measured drift constant, NOT a "
            "calibration-row reading — it was measured against a "
            "different session's baseline, so the normalized line below "
            "is an approximation. Trust the raw line + ratio band for "
            "pre-r13 records; normalized comparisons are exact only "
            "between two records that both carry host_factor."
        )

    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    if not common:
        raise SystemExit("no common queries")
    to, tn = sum(qo[n] for n in common), sum(qn[n] for n in common)
    print(f"common set: {len(common)} queries")
    print(f"raw: {to:.1f} s -> {tn:.1f} s ({tn / to - 1:+.1%})")
    if hf_old and hf_new:
        no, nn = to / hf_old, tn / hf_new
        print(
            f"normalized (old/{hf_old:.3g}, new/{hf_new:.3g}): "
            f"{no:.1f} s -> {nn:.1f} s ({nn / no - 1:+.1%})"
        )
    else:
        print("normalized: n/a (missing host_factor; pass --hf-old)")

    ratios = sorted(
        (qn[n] / qo[n], n) for n in common if qo[n] > 0.3
    )
    rs = [r for r, _ in ratios]
    print(
        f"ratio band (rows > 0.3 s): median {statistics.median(rs):.3f}, "
        f"p10 {rs[len(rs) // 10]:.2f}, p90 {rs[9 * len(rs) // 10]:.2f}"
    )

    # Signal rule (bench.py header): a mover is signal only if its
    # delta exceeds BOTH sides' recorded spread.
    so = old.get("spread", {})
    sn = new.get("spread", {})
    movers = []
    for r, n in ratios:
        tol = 1 + max(so.get(n, 0.2), sn.get(n, 0.2))
        if r > tol or 1 / r > tol:
            movers.append((r, n))
    # r14: rows the bench itself marked unstable (spread_note = both
    # re-measure batches exceeded 0.4 — host-level variance) are
    # labeled so a reader doesn't chase them as code regressions.
    def _noted(rec: dict, n: str) -> bool:
        return "spread_note" in rec.get("stats", {}).get(n, {})

    if movers:
        print("movers beyond their own spread:")
        for r, n in sorted(movers):
            flag = (
                " [noted unstable]"
                if _noted(old, n) or _noted(new, n)
                else ""
            )
            print(
                f"  {n}: {qo[n]:.2f} -> {qn[n]:.2f} s (x{r:.2f}; "
                f"spreads {so.get(n)}/{sn.get(n)}){flag}"
            )
    else:
        print("movers beyond their own spread: none")

    new_rows = sorted(set(qn) - set(qo))
    if new_rows:
        print("new rows:", {n: qn[n] for n in new_rows})


if __name__ == "__main__":
    main()
