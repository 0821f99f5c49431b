"""text_classifier_train: independent replay + learning pins.

The replay below is deliberately NOT the Spark plan or the DuckDB
oracle: plain Python floats (IEEE doubles), Python-int fixed-point
sums, and explicit loops. Because every float op in the trainer is an
IEEE-exact composition (+,-,*,/,sqrt) folded in pinned order, the
replay must agree with the engine BIT-FOR-BIT, not approximately.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from cc_pyspark_spark.functions.text import TOKEN_PATTERN
from cc_pyspark_spark.plans.text import (
    CLS_TRAIN_DIM,
    CLS_TRAIN_LR,
    CLS_TRAIN_ROUNDS,
    text_classifier_train,
)

SF_DIR = "/root/testdata/sf0.001"


def _poly_mix(tok: str) -> int:
    a = 0
    for ch in tok:
        a = (a * 31 + ord(ch)) % 1000003
    return a * 2654435761


def _replay(
    docs: list[str],
) -> tuple[list[float], list[float], list[float], float, float]:
    """Pure-Python trainer replay -> (mu, sd, w, train_acc, base_rate)."""
    d = CLS_TRAIN_DIM
    pat = re.compile(TOKEN_PATTERN)
    toks = [pat.findall(t.lower()) for t in docs]
    toks = [t for t in toks if t]
    # teacher score s and fixed-point mean threshold
    s = []
    for t in toks:
        num = sum((_poly_mix(w) % 65536) - 32768 for w in t)
        s.append(float(num) / float(len(t)))
    thr = float(sum(math.floor(v * 1e12) for v in s)) / (1e12 * float(len(s)))
    y = [1.0 if v > thr else 0.0 for v in s]
    nd = float(len(toks))
    # dense tf
    xtf = []
    for t in toks:
        row = [0] * d
        for w in t:
            row[_poly_mix(w) % d] += 1
        xtf.append([float(c) / float(len(t)) for c in row])
    # fixed-point moments -> mu/sd
    mu, sd = [], []
    for b in range(d):
        m = float(sum(math.floor(r[b] * 1e12) for r in xtf)) / (1e12 * nd)
        m2 = float(sum(math.floor(r[b] * r[b] * 1e12) for r in xtf)) / (
            1e12 * nd
        )
        var = m2 - m * m
        mu.append(m)
        sd.append(1.0 if var <= 0.0 else max(math.sqrt(var), 1e-6))
    xz = [
        [(r[b] - mu[b]) / sd[b] for b in range(d)] + [1.0] for r in xtf
    ]
    w = [0.0] * (d + 1)

    def fold_z(row: list[float]) -> float:
        acc = 0.0
        for b in range(d + 1):
            acc = acc + w[b] * row[b]
        return acc

    for _ in range(CLS_TRAIN_ROUNDS):
        errs = []
        for i, row in enumerate(xz):
            z = fold_z(row)
            errs.append((0.5 + 0.5 * (z / (1.0 + abs(z)))) - y[i])
        for b in range(d + 1):
            g = sum(
                math.floor(errs[i] * xz[i][b] * 1e12) for i in range(len(xz))
            )
            w[b] = w[b] - CLS_TRAIN_LR * (float(g) / (1e12 * nd))
    correct = sum(
        1 for i, row in enumerate(xz) if (fold_z(row) > 0.0) == (y[i] == 1.0)
    )
    base = max(sum(y), len(y) - sum(y)) / len(y)
    return mu, sd, w, correct / len(y), base


@pytest.fixture(scope="module")
def replay():
    docs = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    return _replay(docs)


def test_trainer_matches_independent_replay(spark, replay):
    mu, sd, w, _acc, _base = replay
    got = {
        r["feature_idx"]: r
        for r in text_classifier_train(spark, SF_DIR).collect()
    }
    assert len(got) == CLS_TRAIN_DIM + 1
    for b in range(CLS_TRAIN_DIM):
        assert got[b]["mu"] == mu[b], b
        assert got[b]["sd"] == sd[b], b
        assert got[b]["weight"] == w[b], b
    bias = got[CLS_TRAIN_DIM]
    assert bias["mu"] == 0.0 and bias["sd"] == 1.0
    assert bias["weight"] == w[CLS_TRAIN_DIM]


def test_trainer_actually_learns(replay):
    """Train accuracy must clearly beat the majority-class baseline —
    the guard against a trainer that converges to the trivial
    predictor (the failure mode before feature standardization)."""
    _mu, _sd, _w, acc, base = replay
    assert acc >= base + 0.15, (acc, base)


def test_weights_touch_only_supported_buckets(replay):
    """Buckets no token hashes to must keep mu=0, sd=1, w=0 (their
    features are identically zero after standardization)."""
    mu, sd, w, _acc, _base = replay
    untouched = [
        b for b in range(CLS_TRAIN_DIM) if mu[b] == 0.0 and sd[b] == 1.0
    ]
    assert untouched, "fixture should leave some of the 64 buckets empty"
    for b in untouched:
        assert w[b] == 0.0


def test_eval_confusion_matches_replay(spark, replay):
    """text_classifier_eval's integer confusion counts must equal the
    pure-Python replay's (same folds, same weights)."""
    import re as _re

    from cc_pyspark_spark.plans.text import text_classifier_eval

    mu, sd, w, _acc, _base = replay
    docs = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    pat = _re.compile(TOKEN_PATTERN)
    want: dict[tuple[int, bool], int] = {}
    toks_all = [pat.findall(t.lower()) for t in docs]
    toks_all = [t for t in toks_all if t]
    s = [
        float(sum((_poly_mix(x) % 65536) - 32768 for x in t)) / float(len(t))
        for t in toks_all
    ]
    thr = float(sum(math.floor(v * 1e12) for v in s)) / (1e12 * float(len(s)))
    for t, sv in zip(toks_all, s):
        y = 1 if sv > thr else 0
        row = [0] * CLS_TRAIN_DIM
        for x in t:
            row[_poly_mix(x) % CLS_TRAIN_DIM] += 1
        acc = 0.0
        for b in range(CLS_TRAIN_DIM):
            acc = acc + (float(row[b]) / float(len(t)) - mu[b]) / sd[b] * w[b]
        acc = acc + 1.0 * w[CLS_TRAIN_DIM]
        key = (y, acc > 0.0)
        want[key] = want.get(key, 0) + 1
    got = {
        (r["label"], r["pred"]): r["n"]
        for r in text_classifier_eval(spark, SF_DIR).collect()
    }
    assert got == want


def test_empty_corpus_returns_zero_model(spark):
    """A corpus the gate filtered to nothing must yield the
    initialized model (65 rows, w=0, mu=0, sd=1) — matching the
    oracle's LEFT-JOIN/COALESCE semantics — not an array-index crash."""
    from cc_pyspark_spark.plans.text import classifier_train_frame

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = classifier_train_frame(spark, empty).collect()
    assert len(out) == CLS_TRAIN_DIM + 1
    assert all(
        r["weight"] == 0.0 and r["mu"] == 0.0 and r["sd"] == 1.0 for r in out
    )
