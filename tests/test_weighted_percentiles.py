"""Independent pin for agg_weighted_percentiles (plans/text.py, r9).

The Spark plan and its DuckDB oracle share the integer threshold
algebra (``cum * den >= tot * num``), so a shared-algebra bug would
keep both green. This pin re-derives the lower weighted quantile from
the DEFINITION — smallest value v whose cumulative token-weight
fraction reaches p — using ``fractions.Fraction`` comparison and a
hard-coded percentile list, sharing no expression or constant object
with the implementation. Only the query name and output column names
are common surface.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from cc_pyspark_spark.functions.text import tokenize
from cc_pyspark_spark.plans import QUERIES
from tests.conftest import SF_DIR

# The query's documented contract: lower weighted quantiles at these
# probabilities, plus the per-lang token total. Hard-coded on purpose —
# if plans/text.py's WP_PCTS drifts, this pin must fail, not follow.
_PCTS = (("wp25", Fraction(1, 4)), ("wp50", Fraction(1, 2)), ("wp75", Fraction(3, 4)))


def test_weighted_percentiles_match_independent_python(spark):
    got = {
        r["lang"]: r
        for r in QUERIES["agg_weighted_percentiles"].spark(spark, SF_DIR).collect()
    }
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang", "n_chars", F.size(tokenize("text")).alias("w"))
        .collect()
    )
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append((r["n_chars"], r["w"]))
    assert set(got) == set(by_lang)
    for lang, rows in by_lang.items():
        rows.sort()
        tot = sum(w for _, w in rows)
        assert got[lang]["total_tokens"] == tot
        for name, p in _PCTS:
            cum = 0
            expect = None
            for v, w in rows:
                cum += w
                if Fraction(cum, tot) >= p:
                    expect = v
                    break
            assert got[lang][name] == expect, (lang, name)
