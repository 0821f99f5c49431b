"""Community operators (operators/community.py, r9): synchronous label
propagation and k-core peeling.

The DuckDB oracles replay the same rounds; these tests pin (a) the
operators do the RIGHT thing on graphs with known structure (two
cliques + a bridge, stars, paths) against independent pure-Python
re-derivations, (b) the fixture's k-core reaches its fixed point well
inside the registered round budget (the convergence tripwire the
fixed-round oracle relies on), and (c) the converged wrapper agrees
with the fixed-round core.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from cc_pyspark_spark.operators.community import (
    kcore,
    kcore_converged,
    label_propagation,
    lpa_converged,
)
from cc_pyspark_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long"
    )


def _py_lpa(pairs, rounds):
    """Independent synchronous LPA: plurality label among neighbors
    plus one self-vote, min on ties."""
    nbrs = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v, ns in nbrs.items():
            cnt = defaultdict(int)
            for u in ns:
                cnt[lab[u]] += 1
            cnt[lab[v]] += 1
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = new
    return lab


def _py_kcore(pairs, k):
    cur = set(pairs)
    while True:
        deg = defaultdict(int)
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        alive = {v for v, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in cur if a in alive and b in alive}
        if nxt == cur:
            deg = defaultdict(int)
            for a, b in nxt:
                deg[a] += 1
                deg[b] += 1
            return dict(deg)
        cur = nxt


# two 4-cliques joined by one bridge edge (3-7): communities should
# NOT merge across the bridge, and the 3-core should drop the bridge
# but keep both cliques intact
_TWO_CLIQUES = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),
    (3, 7),
]


def test_lpa_two_cliques_stay_separate(spark):
    got = {
        r["id"]: r["community"]
        for r in label_propagation(_edges_df(spark, _TWO_CLIQUES), rounds=4).collect()
    }
    assert got == _py_lpa(_TWO_CLIQUES, 4)
    # the structural claim, independent of the replay: each clique is
    # one community and the two communities differ
    assert len({got[v] for v in (0, 1, 2, 3)}) == 1
    assert len({got[v] for v in (4, 5, 6, 7)}) == 1
    assert got[0] != got[4]


def test_lpa_star_adopts_hub_label(spark):
    # star: each leaf sees the hub's label + its own self-vote (tie ->
    # min = hub id, since the hub's id is smallest); the hub's
    # self-vote + six distinct leaf labels tie -> keeps its own min id
    star = [(10, leaf) for leaf in range(11, 17)]
    got = {
        r["id"]: r["community"]
        for r in label_propagation(_edges_df(spark, star), rounds=1).collect()
    }
    assert got == _py_lpa(star, 1)
    assert got == {v: 10 for v in range(10, 17)}


def test_lpa_converged_matches_fixed_rounds(spark):
    """Deployment wrapper (VERDICT r9 ask #4): on a converging graph
    (two cliques + bridge reaches its fixed point at round 3) the
    wrapper's labels equal the fixed-round plan's."""
    conv = {
        r["id"]: r["community"]
        for r in lpa_converged(_edges_df(spark, _TWO_CLIQUES)).collect()
    }
    fixed = {
        r["id"]: r["community"]
        for r in label_propagation(_edges_df(spark, _TWO_CLIQUES), rounds=4).collect()
    }
    assert conv == fixed == _py_lpa(_TWO_CLIQUES, 4)


# A genuine period-2 oscillator UNDER the self-vote damper (found by
# exhaustive search over all graphs with <=6 vertices): labels alternate
# between {0,0,0,1,1,1} and {0,1,1,0,0,0} forever from round 3 on, so a
# change-count-only stop rule would spin to the max_rounds guard.
_LPA_OSCILLATOR = [(0, 1), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5)]


def test_lpa_converged_period2_detector(spark):
    """The round-2-ago comparison fires at round 4 (the first round
    whose labels equal the round-2-ago frame) and the result is the
    elementwise min of the two alternating phases — here all-0."""
    got = {
        r["id"]: r["community"]
        for r in lpa_converged(_edges_df(spark, _LPA_OSCILLATOR), max_rounds=4).collect()
    }
    assert got == {v: 0 for v in range(6)}


def test_lpa_converged_guard_trips(spark):
    # detection needs 4 rounds on the oscillator; a 3-round budget must
    # RAISE, never silently return a mid-oscillation frame
    with pytest.raises(RuntimeError, match="no fixed point"):
        lpa_converged(_edges_df(spark, _LPA_OSCILLATOR), max_rounds=3)


def test_kcore_two_cliques_all_survive(spark):
    # every vertex has degree >= 3 (bridge endpoints have 4), so the
    # 3-core is the whole graph, bridge included
    got = {
        r["id"]: r["deg"]
        for r in kcore(_edges_df(spark, _TWO_CLIQUES), k=3, rounds=3).collect()
    }
    assert got == _py_kcore(_TWO_CLIQUES, 3)
    assert got == {0: 3, 1: 3, 2: 3, 3: 4, 4: 3, 5: 3, 6: 3, 7: 4}


def test_kcore_4_peels_cliques_apart(spark):
    # at k=4 the bridge endpoints' extra degree doesn't save anyone:
    # clique vertices have degree 3, so the whole graph peels away
    got = kcore(_edges_df(spark, _TWO_CLIQUES), k=4, rounds=3).collect()
    assert got == []
    assert _py_kcore(_TWO_CLIQUES, 4) == {}


def test_kcore_path_peels_to_nothing(spark):
    # a path has no 2-core: peeling strips one endpoint layer per
    # round — the worst case the operator docstring warns about
    path = [(i, i + 1) for i in range(6)]
    rows = kcore(_edges_df(spark, path), k=2, rounds=4).collect()
    assert rows == []
    assert _py_kcore(path, 2) == {}


def test_kcore_converged_matches_fixed_rounds(spark):
    fixed = {
        r["id"]: r["deg"]
        for r in kcore(_edges_df(spark, _TWO_CLIQUES), k=3, rounds=4).collect()
    }
    conv = {
        r["id"]: r["deg"]
        for r in kcore_converged(_edges_df(spark, _TWO_CLIQUES), k=3).collect()
    }
    assert fixed == conv


def test_kcore_converged_guard_trips(spark):
    # max_rounds guard: a long path peels one layer per round
    path = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError, match="no fixed point"):
        kcore_converged(_edges_df(spark, path), k=2, max_rounds=2)


def test_fixture_kcore_fixpoint_inside_round_budget(spark):
    """Convergence tripwire for the registered graph_kcore oracle: the
    fixture graph must reach its peeling fixed point strictly inside
    the fixed round budget (one extra round changes nothing), so the
    4-round oracle output IS the k-core, not a truncation."""
    from cc_pyspark_spark.plans.graphq import _KCORE_K, _KCORE_ROUNDS

    q = QUERIES["graph_kcore"]
    at_budget = {
        (r["id"], r["deg"]) for r in q.spark(spark, SF_DIR).collect()
    }
    # independent python peel on the same bipartite edge set
    import duckdb

    con = duckdb.connect()
    pairs = con.sql(
        f"""SELECT DISTINCT 2 * o_custkey AS a, 2 * l_suppkey + 1 AS b
        FROM '{SF_DIR}/orders.parquet'
        JOIN '{SF_DIR}/lineitem.parquet' ON l_orderkey = o_orderkey"""
    ).fetchall()
    fixpoint = _py_kcore(pairs, _KCORE_K)
    assert at_budget == set(fixpoint.items())
    # every surviving degree satisfies the defining k-core property
    assert all(d >= _KCORE_K for _, d in at_budget)
    assert len(at_budget) > 0
    assert _KCORE_ROUNDS >= 3  # budget leaves headroom over the fixture's 2


def test_fixture_lpa_matches_independent_python(spark):
    """The registered query's labels equal an independent pure-Python
    synchronous-LPA replay on the same co-order edge set."""
    from cc_pyspark_spark.plans.graphq import _LPA_ROUNDS, _co_order_edges

    pairs = [
        (r["a"], r["b"]) for r in _co_order_edges(spark, SF_DIR).collect()
    ]
    got = {
        r["id"]: r["community"]
        for r in QUERIES["graph_label_propagation"].spark(spark, SF_DIR).collect()
    }
    assert got == _py_lpa(pairs, _LPA_ROUNDS)


def test_fixture_lpa_converged_terminates_and_covers(spark):
    """The deployment wrapper must terminate on the real fixture graph
    (fixed point or detected 2-cycle) inside the guard and label every
    vertex."""
    from cc_pyspark_spark.plans.graphq import _co_order_edges

    edges = _co_order_edges(spark, SF_DIR)
    conv = {
        r["id"]: r["community"]
        for r in lpa_converged(edges, max_rounds=32).collect()
    }
    n_verts = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .distinct()
        .count()
    )
    assert len(conv) == n_verts
