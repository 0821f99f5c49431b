"""pagerank_converged (r11): L1 moved-mass stop over the exact
fixed-point update, raising guard — completes the converged-wrapper
family for the last fixed-rounds-only iterative operator."""

from __future__ import annotations

import pytest

from cc_pyspark_spark.operators.pagerank import (
    PAGERANK_SCALE,
    pagerank_converged,
    pagerank_fixed,
)

#: Star with a dangling hub: 1..4 -> 9 (9 has no out-edge), so the
#: dangling-mass path is exercised, not just the contribution sum.
_STAR = [(1, 9), (2, 9), (3, 9), (4, 9)]

_TOL = 10**12  # 1e-3 of total mass: keeps the geometric tail short


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "s long, t long")


def test_converged_close_to_deep_fixed_run(spark):
    conv = {
        r["id"]: r["r"]
        for r in pagerank_converged(
            _edges(spark, _STAR), tol_units=_TOL
        ).collect()
    }
    deep = {
        r["id"]: r["r"]
        for r in pagerank_fixed(_edges(spark, _STAR), n_iter=60).collect()
    }
    assert conv.keys() == deep.keys()
    # stopping when <= tol mass moved over a probe span leaves the
    # iterate within tol/(1-d) ~ 6.7x tol of the true fixed point
    assert sum(abs(conv[v] - deep[v]) for v in conv) <= 7 * _TOL
    # structure: the hub out-ranks every leaf, leaves are symmetric
    assert all(conv[9] > conv[u] for u in (1, 2, 3, 4))
    assert len({conv[u] for u in (1, 2, 3, 4)}) == 1
    # mass conservation: each round floors away < |E| + |V| + 1 units
    total = sum(conv.values())
    assert PAGERANK_SCALE * 0.999 < total <= PAGERANK_SCALE


def test_converged_guard_trips(spark):
    # tol below the geometric tail reachable in 8 rounds must RAISE,
    # never return a still-moving frame
    with pytest.raises(RuntimeError, match="moved mass above"):
        pagerank_converged(_edges(spark, _STAR), tol_units=0, max_rounds=8)


def test_converged_deterministic_across_partitionings(spark):
    # looser tol (1e-2 mass): halves the geometric tail — this test
    # cares about bit-identity across partitionings, not tightness
    a = pagerank_converged(_edges(spark, _STAR), tol_units=10**13).collect()
    b = pagerank_converged(
        _edges(spark, _STAR).repartition(5, "t"), tol_units=10**13
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
