"""r12 hardening (ADVICE r11): pagerank_converged's probe really
spans probe_every rounds, --graph_rounds 0 reaches the algorithms,
SPARK_GRAFT_RUNS is validated, gen_scaled_sf key ranges are checked,
and the README query count cannot drift again."""

from __future__ import annotations

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_pagerank_converged_probe_spans_probe_every(spark):
    """ADVICE r11 (medium): with the old per-round `ranks`
    reassignment, a probe measured only ONE round's delta, so a tol
    between the single-step and the 4-round-span moved mass stopped
    ~probe_every× too early. Pin the span semantics: the wrapper
    must run at least as many rounds as a single-step stop would,
    and the frame it returns must sit within tol/(1-d) of a deep
    fixed run (the span guarantee)."""
    from cc_pyspark_spark.operators.pagerank import (
        pagerank_converged,
        pagerank_fixed,
    )

    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (4, 9)], "s long, t long"
    )
    tol = 10**12
    conv = {
        r["id"]: r["r"]
        for r in pagerank_converged(
            edges, tol_units=tol, probe_every=4
        ).collect()
    }
    deep = {
        r["id"]: r["r"] for r in pagerank_fixed(edges, n_iter=60).collect()
    }
    # span stop => L1 distance to the fixed point <= tol/(1-0.85)
    assert sum(abs(conv[v] - deep[v]) for v in conv) <= 7 * tol


def test_pagerank_converged_probe_stricter_than_single_step(spark):
    """Direct span-vs-step pin: replay the exact integer update by
    hand, find the first round where the SINGLE-step L1 delta dips
    under tol while the 4-round SPAN is still above it, and assert
    the wrapper does NOT return that early frame (it must keep
    iterating until the span condition holds)."""
    from cc_pyspark_spark.operators.pagerank import (
        pagerank_converged,
        pagerank_fixed,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "s long, t long"
    )

    def frame(n_rounds):
        return {
            r["id"]: r["r"]
            for r in pagerank_fixed(edges, n_iter=n_rounds).collect()
        }

    frames = {k: frame(k) for k in range(1, 25)}

    def l1(a, b):
        return sum(abs(a[v] - b[v]) for v in a)

    # pick tol between step-delta and span-delta at some probe round
    probe_tol = None
    for k in range(5, 21, 4):  # probe rounds under probe_every=4
        step = l1(frames[k], frames[k - 1])
        span = l1(frames[k], frames[k - 4])
        if step < span:
            probe_tol = (step + span) // 2
            early = frames[k]
            break
    assert probe_tol is not None, "fixture never separates step/span"
    conv = {
        r["id"]: r["r"]
        for r in pagerank_converged(
            edges, tol_units=probe_tol, probe_every=4
        ).collect()
    }
    # stopping on the single-step delta would have returned `early`;
    # the span probe must keep going to a strictly later frame
    assert conv != early


def test_graph_rounds_zero_reaches_lpa(spark, tmp_path):
    """ADVICE r11: `args.graph_rounds or 4` swallowed an explicit 0;
    the rounds=0 identity contract must be CLI-reachable."""
    from cc_pyspark_spark.jobs.runner import main

    src = tmp_path / "edges"
    out = tmp_path / "out"
    spark.createDataFrame(
        [(1, 2), (2, 3)], "s long, t long"
    ).write.parquet(str(src))
    rc = main(
        [
            "graph_analyze",
            str(src),
            str(out),
            "--graph_algo",
            "lpa",
            "--graph_rounds",
            "0",
            "--num_output_partitions",
            "1",
            "--spark_master",
            "local[4]",
            "--output_compression",
            "snappy",
        ]
    )
    assert rc == 0
    got = {
        r["id"]: r["community"]
        for r in spark.read.parquet(str(out)).collect()
    }
    # zero rounds = identity labeling, not the silent 4-round default
    assert got == {1: 1, 2: 2, 3: 3}


def test_bench_rejects_zero_runs(monkeypatch):
    """ADVICE r11: SPARK_GRAFT_RUNS=0 must fail before any query
    executes, not crash statistics.median afterwards."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_RUNS", "0")
    with pytest.raises(SystemExit, match="SPARK_GRAFT_RUNS"):
        bench.main()


def test_gen_scaled_sf_rejects_key_range_escape(spark):
    """ADVICE r11: a base key >= KEY_SHIFT would silently overlap
    replica ranges; the generator must now fail loudly."""
    import scripts.gen_scaled_sf as g

    bad = spark.createDataFrame(
        [(g.KEY_SHIFT + 5, "x")], "doc_id long, text string"
    )
    with pytest.raises(SystemExit, match="escapes"):
        g.check_key_ranges(bad, "documents", ("doc_id",))
    ok = spark.createDataFrame(
        [(g.KEY_SHIFT - 1, "x")], "doc_id long, text string"
    )
    g.check_key_ranges(ok, "documents", ("doc_id",))  # must not raise


def test_readme_query_count_matches_registry():
    """VERDICT r11 ask #7 (second stale-count round): the README's
    'N named queries / N/N oracled' line is now pinned to
    len(QUERIES), so drift is a test failure instead of a doc bug."""
    from cc_pyspark_spark.plans import QUERIES

    text = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) named queries", text)
    assert m, "README lost its query-count line"
    assert int(m.group(1)) == len(QUERIES)
    m2 = re.search(r"(\d+)/(\d+) oracled", text)
    assert m2, "README lost its oracled-count line"
    oracled = sum(1 for q in QUERIES.values() if q.oracle is not None)
    assert (int(m2.group(1)), int(m2.group(2))) == (oracled, len(QUERIES))
