"""Local replica of the driver's oracle-compare protocol.

Both sides → pandas → columns sorted by name → rows sorted by the
string form of every column → exact string equality (canonical-CSV
analog of FIXTURES.md's hash-compare). Floats must be bit-identical —
the engine's determinism contract, not a tolerance compare.
"""

from __future__ import annotations

import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: "" if v is None or v != v else repr(v))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a = canonicalize(spark_pdf)
    b = canonicalize(duck_pdf)
    if not a.equals(b):
        neq = a.compare(b) if a.shape == b.shape else None
        raise AssertionError(
            f"{name}: value mismatch\n"
            f"spark head:\n{a.head(8)}\nduck head:\n{b.head(8)}\n"
            f"diff:\n{neq.head(20) if neq is not None else 'shape differs'}"
        )
