"""C4-style line-level cleaning (Raffel et al. 2020, §2.2 heuristics).

The complement of the doc-level Gopher gate (plans/text.py): C4's rules
act on LINES — keep only lines that end in terminal punctuation and
have enough words, drop boilerplate lines that repeat across the
corpus, and gate documents on surviving-line count plus the
lorem-ipsum / curly-brace page rules.

Scale shape (100 TB): one narrow posexplode, then ONE wide shuffle
keyed by xxhash64 of the normalized line (8 bytes — the corpus-level
line-frequency table), a join back on the same key, and the per-doc
rebuild keyed by doc_id. Line frequency is the only corpus-global
state, and it is a (hash, count, first-site) table a fraction the size
of the input. The oracle replays everything (including first-occurrence
keep) on the raw line text in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register

#: A line survives if it ends with terminal punctuation and carries at
#: least MIN_WORDS whitespace words, and does not mention javascript
#: (the C4 boilerplate tell).
MIN_WORDS = 3
#: Corpus-frequency cutoff: a normalized line occurring this many times
#: or more is boilerplate — only its FIRST occurrence (lowest
#: (doc_id, line_no)) survives.
FREQ_CUTOFF = 3
#: Document gate: at least this many surviving lines, and none of the
#: page-level poison markers.
MIN_KEPT_LINES = 1

_TERMINAL = ("." , "!", "?", '"', "”")

#: The synthetic documents are single-line word salad with no terminal
#: punctuation — every C4 rule would be vacuously false. Like
#: curation_pii_redact plants PII specimens, the query plants line
#: structure deterministically from each doc's own text: a keepable
#: sentence, a javascript boilerplate line (line-rule drop), a
#: corpus-constant footer (frequency drop beyond its first site), and a
#: tail that flips between a kept sentence and a '{'-poisoned page
#: marker by doc_id. Spark and the oracle build the identical string.
_AUG_SPARK = (
    "concat(substring(text, 1, 40), '.', chr(10), "
    "'Please enable javascript to continue.', chr(10), "
    "'All rights reserved worldwide today.', chr(10), "
    "substring(text, 41, 60), "
    "CASE WHEN doc_id % 7 = 0 THEN ' {' ELSE '.' END)"
)
_AUG_DUCK = (
    "substr(text, 1, 40) || '.' || chr(10) || "
    "'Please enable javascript to continue.' || chr(10) || "
    "'All rights reserved worldwide today.' || chr(10) || "
    "substr(text, 41, 60) || "
    "(CASE WHEN doc_id % 7 = 0 THEN ' {' ELSE '.' END)"
)


def _line_ok(line) -> F.Column:
    t = F.trim(line)
    ends = None
    for p in _TERMINAL:
        cond = t.endswith(p)
        ends = cond if ends is None else (ends | cond)
    words = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))
    return (
        ends
        & (words >= MIN_WORDS)
        & ~F.lower(t).contains("javascript")
    )


def duck_c4_ctes(source: str) -> str:
    """The C4 line-rule CTE bodies (explode → line flags → corpus line
    frequency → kept lines → per-doc rebuild) over any `source` with
    (doc_id, text) — shared by the text_c4_line_rules oracle and the
    curation_pipeline_full oracle so the rules cannot drift apart."""
    return f"""l AS (
  SELECT doc_id, text,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS ln
  FROM {source}
),
f AS (
  SELECT doc_id, ln, line, trim(line) AS t,
         (
           (ends_with(trim(line), '.') OR ends_with(trim(line), '!')
            OR ends_with(trim(line), '?') OR ends_with(trim(line), '"')
            OR ends_with(trim(line), chr(8221)))
           AND len(list_filter(regexp_split_to_array(trim(line), '\\s+'),
                               x -> x <> '')) >= {MIN_WORDS}
           AND NOT contains(lower(trim(line)), 'javascript')
         ) AS ok
  FROM l
),
occ AS (
  SELECT t, COUNT(*) AS n,
         MIN(doc_id * 1000000 + ln) AS first_site
  FROM f WHERE ok GROUP BY t
),
kept AS (
  SELECT f.doc_id, f.ln, f.line
  FROM f JOIN occ ON f.t = occ.t
  WHERE f.ok AND (occ.n < {FREQ_CUTOFF}
                  OR f.doc_id * 1000000 + f.ln = occ.first_site)
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(line, chr(10) ORDER BY ln) AS cleaned_text
  FROM kept GROUP BY doc_id
)"""


def duck_c4_doc_sql(source: str, extra_cols: str = "") -> str:
    """The per-document rebuild SELECT over `source` joined to the
    per_doc CTE from duck_c4_ctes — (doc_id[, extra_cols], n_lines,
    n_kept, cleaned_text, c4_pass). `extra_cols` is a raw column list
    fragment like " d.lang," for pass-through columns."""
    return f"""SELECT d.doc_id,{extra_cols}
       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
       CAST(COALESCE(p.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(p.cleaned_text, '') AS cleaned_text,
       CAST(CASE WHEN COALESCE(p.n_kept, 0) >= {MIN_KEPT_LINES}
                  AND NOT contains(d.text, '{{')
                  AND NOT contains(lower(d.text), 'lorem ipsum')
            THEN 1 ELSE 0 END AS BIGINT) AS c4_pass
FROM {source} d LEFT JOIN per_doc p ON d.doc_id = p.doc_id"""


@register(
    "text_c4_line_rules",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_AUG_DUCK} AS text FROM documents),
{duck_c4_ctes('aug')}
{duck_c4_doc_sql('aug')}
""",
    description="C4-style line-level cleaning (Raffel et al. 2020 §2.2): "
    "keep lines ending in terminal punctuation with >=3 words and no "
    "'javascript'; corpus-frequent lines (>=3 occurrences of the "
    "normalized text) keep only their first site; docs gate on surviving "
    "lines + lorem-ipsum/curly-brace page rules. One 8-byte-keyed "
    "line-frequency shuffle + doc_id rebuild — the line-level complement "
    "of the Gopher doc gate",
    tags=("text", "curation"),
)
def text_c4_line_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.expr(_AUG_SPARK).alias("text")
    )
    return c4_clean_frame(docs)


def c4_clean_frame(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """C4 line-rules over any frame with (doc_id, text) — the reusable
    form behind the registered query (which feeds it the planted-line
    fixture augmentation) and the CLI `c4_clean` doc job (raw text).

    `carry` threads extra source columns (e.g. ("lang",)) through the
    explode/rebuild so a downstream pipeline stage can keep them
    WITHOUT joining back to the source (the curation_pipeline_full
    shape — same contract as gopher_signals_frame's carry).

    Scan budget: the classic two-pass frequency shape — one pruned pass
    (tk, site only) builds the corpus line-frequency table, one full
    pass rebuilds documents. There is NO third scan: `split` always
    yields at least one line per document, so the doc-level fields
    (line count, page poison flags) ride the exploded rows as two
    narrow columns and the per-doc rebuild retains every document
    without joining back to the source. Both wide shuffles (frequency
    groupBy, frequency join) are keyed by 8-byte xxhash64(trim(line)).
    """
    lines = docs.select(
        "doc_id",
        *carry,
        F.size(F.split("text", "\n")).cast("bigint").alias("n_lines"),
        (
            ~F.col("text").contains("{")
            & ~F.lower("text").contains("lorem ipsum")
        ).alias("page_ok"),
        F.posexplode(F.split("text", "\n")).alias("ln0", "line"),
    ).select(
        "doc_id",
        *carry,
        "n_lines",
        "page_ok",
        (F.col("ln0") + 1).alias("ln"),
        "line",
    )
    flagged = lines.select(
        "doc_id",
        *carry,
        "n_lines",
        "page_ok",
        "ln",
        "line",
        F.xxhash64(F.trim("line")).alias("tk"),
        (F.col("doc_id") * 1000000 + F.col("ln")).alias("site"),
        _line_ok(F.col("line")).alias("ok"),
    )
    # Corpus line-frequency table over OK lines only: shuffle keyed by
    # xxhash64(trim(line)) (8 B); the raw line text never rides the
    # frequency shuffle. site = doc_id*1e6+ln gives a total order
    # matching the oracle's MIN (line numbers stay < 1e6).
    occ = (
        flagged.filter("ok")
        .groupBy("tk")
        .agg(F.count("*").alias("n"), F.min("site").alias("first_site"))
    )
    joined = flagged.join(occ, "tk", "left")
    kept_cond = (
        F.col("ok")
        & (
            (F.col("n") < FREQ_CUTOFF)
            | (F.col("site") == F.col("first_site"))
        )
    )
    # collect_list drops nulls, so the conditional struct keeps only
    # surviving lines while the groupBy still sees every document.
    per_doc = joined.groupBy("doc_id").agg(
        *[F.first(c).alias(c) for c in carry],
        F.first("n_lines").alias("n_lines"),
        F.first("page_ok").alias("page_ok"),
        F.sum(kept_cond.cast("bigint")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(kept_cond, F.struct("ln", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("cleaned_text"),
    )
    gate = (F.col("n_kept") >= MIN_KEPT_LINES) & F.col("page_ok")
    return per_doc.select(
        "doc_id",
        *carry,
        "n_lines",
        F.col("n_kept").cast("bigint").alias("n_kept"),
        "cleaned_text",
        F.when(gate, 1).otherwise(0).cast("bigint").alias("c4_pass"),
    )
