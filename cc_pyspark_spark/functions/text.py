"""Text analysis column functions — all JVM-side (no Python UDFs).

Mapping of the reference's record-level Python (SURVEY.md §2.8) to
built-in column expressions: F1 regex tokenize (word_count.py:25,36-37)
becomes `regexp_extract_all + lower`; per-doc Counter pre-aggregation
(word_count.py:36-39) falls out of Catalyst's partial+final hash agg.

Everything here stays inside whole-stage codegen, which is the point:
at 100 TB the tokenizer is the hot loop, and a row-at-a-time Python UDF
would be the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Unicode-light tokenizer pattern, the `\w+`-lowercase analog of
#: word_count.py:25 restricted to [a-z0-9] so both engines (Spark re /
#: DuckDB RE2) agree byte-for-byte.
TOKEN_PATTERN = "[a-z0-9]+"

#: Small stopword list used by quality scoring / language heuristics.
STOPWORDS = ("the", "and", "of", "to", "a", "in")


def tokenize(col: str | Column) -> Column:
    """F1: lowercase word tokens as array<string> (word_count.py:25).

    Accepts a column name / SQL expression string, or a Column.
    """
    if isinstance(col, str):
        return F.expr(f"regexp_extract_all(lower({col}), '{TOKEN_PATTERN}', 0)")
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), F.lit(0))


#: Unicode tokenizer pattern — the true `\w+` analog (word_count.py:25)
#: for multilingual corpora. Used by jobs; the oracle queries keep the
#: ASCII pattern so DuckDB's RE2 agrees byte-for-byte.
TOKEN_PATTERN_UNICODE = r"[\\p{L}\\p{N}_]+"


def tokenize_unicode(col: str | Column) -> Column:
    """F1 with full Unicode word classes (jobs path)."""
    if isinstance(col, str):
        return F.expr(
            f"regexp_extract_all(lower({col}), '{TOKEN_PATTERN_UNICODE}', 0)"
        )
    return F.regexp_extract_all(
        F.lower(col), F.lit(TOKEN_PATTERN_UNICODE.replace("\\\\", "\\")), F.lit(0)
    )


def shingles(tokens_col: str, k: int = 3) -> Column:
    """Word k-grams (as space-joined strings) from a token array column.

    Built with `transform(sequence(...))` — pure Catalyst, no shuffle,
    no Python. Used by MinHash/Jaccard dedup.

    Documents shorter than ``k`` tokens yield an empty array: without the
    guard, ``sequence(0, size - k)`` turns negative and the element access
    throws ``[INVALID_ARRAY_INDEX]`` under Spark 4's default ANSI mode,
    aborting the whole job on the first short record.
    """
    parts = ", ".join(f"{tokens_col}[i + {j}]" for j in range(k))
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {k} THEN "
        f"transform(sequence(0, size({tokens_col}) - {k}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def stopword_count(tokens_col: str, words: tuple[str, ...] = STOPWORDS) -> Column:
    """Count of stopword occurrences inside a token array."""
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({tokens_col}, t -> t IN ({lst})))")


def marker_score(tokens_col: str, markers: tuple[str, ...]) -> Column:
    """Occurrence count of a marker-word set (language-ID heuristic)."""
    lst = ", ".join(f"'{w}'" for w in markers)
    return F.expr(f"size(filter({tokens_col}, t -> t IN ({lst})))")
