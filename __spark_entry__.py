"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are served from the engine's query
registry (cc_pyspark_spark.plans.registry) — one entry per implemented
operator from SURVEY.md §2 plus the beyond-reference LLM-pipeline
operators.

The per-round driver checks exactly the FIRST 50 entries in dict order,
so ``queries()`` emits a curated priority block first: the fixed
8-headliner ``DRIVER_CORE`` (every core name is also in
``bench.HEADLINERS``, so it is perf-gated every round) plus a 42-slot
rotation window.  Every name outside the window stays registered,
exported, benched where applicable, and re-verified by the sf0.001
DuckDB-parity pytest every round.

Rotation protocol (stable since r10; per-round narratives are archived
verbatim in SCALING.md "r15 additions"):

* OLDEST-FIRST — the window takes the cohort whose last driver row is
  stalest (the ledger is CORRECTNESS_r01..r{N-1}).
* New registrations get FIRST-ROW slots in the same window; each one
  displaces a rotation name to the next round's head.
* When candidates exceed slots, the displaced name is the one with the
  MOST independent coverage (benched every round AND re-verified in the
  parity pytest / judge full-registry sweeps).

Round-15 window (VERDICT r14 ask #1, executing the committed plan):
``agg_theta_sketch_intersect`` FIRST (the r14 displacement, restoring
its floor), then 41 of the 42 r10-last-row names (alphabetical).  The
cohort counts 42 for 41 remaining slots, so ONE r10 name is displaced
to the r16 head per the rule above: ``dedup_exact`` (perf-gated bench
row every round since r2, deterministic hash-groupBy, re-verified in
every sf0.001 parity pytest run AND the r14 judge's independent
219/219 full-registry sf0.01 sweep).  No new r15 registrations at
window-commit time; late registrations take in-window first-row slots
per the displacement rule.  Floor after r15: r10 for exactly
``dedup_exact``, r11+ for everything else.  Full-registry cycle stays
~4-5 rounds at 219 registered queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cc_pyspark_spark.plans import QUERIES

#: Fixed 8-headliner core: benched AND driver-gated every round
#: (stable since r9; every former core name cycles through the
#: rotation slots and keeps its bench row).
DRIVER_CORE: tuple[str, ...] = (
    "tpch_q1_pricing_summary",
    "tpch_q19_disjunctive",
    "dedup_minhash_scale",
    "dedup_embedding_scale_wide",
    "sim_ann_ivf",
    "events_session_window",
    "text_bpe_token_count",
    "curation_pipeline_e2e",
)

DRIVER_PRIORITY: tuple[str, ...] = DRIVER_CORE + (
    # ================= r15 rotation (VERDICT r14 ask #1) =============
    # Histogram going in: r9:1 (the displaced name below), r10:42,
    # r11:42, r12:42, r13:42, r14:50.  42 slots = the displaced r9
    # name + 41 of the 42 r10-last-row names; dedup_exact displaced
    # to the r16 head (max independent coverage — see module
    # docstring).
    #
    # -- the displaced r9 name (r14 displacement rule) --
    "agg_theta_sketch_intersect",
    # -- 41 of the 42 r10-last-row names (alphabetical; dedup_exact
    #    displaced to the r16 head) --
    "agg_collect_sorted_list",
    "agg_count_by_key",
    "agg_distinct_pairs",
    "curation_contamination",
    "curation_domain_cap",
    "curation_mix_execute",
    "curation_repetition_signals",
    "curation_soft_dedup",
    "curation_token_budget_mix",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_url_canonical",
    "embedding_pq_codes",
    "graph_hits",
    "graph_modularity",
    "join_inner_dims",
    "multimodal_tar_index",
    "multimodal_zip_probe",
    "project_computed",
    "set_union_distinct",
    "sim_ann_pq_adc",
    "sim_bitext_mine",
    "sim_mmr_rerank",
    "string_functions",
    "text_bigram_counts",
    "text_classifier_train_sparse",
    "text_fingerprint",
    "text_kneser_ney_bigram",
    "text_lang_id",
    "text_quality_score",
    "text_rolling_fingerprint",
    "text_token_stats",
    "text_top_terms_tfidf",
    "text_vocab_coverage",
    "topk_global",
    "tpch_q22_global_sales_opportunity",
    "wat_links_host_graph",
    "window_dense_ids",
    "window_topn_per_group",
)


def _ordered() -> dict[str, object]:
    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_PRIORITY names missing from registry: {missing}")
    out = {n: QUERIES[n] for n in DRIVER_PRIORITY}
    out.update((n, q) for n, q in QUERIES.items() if n not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every oracle-expressible query."""
    return {
        name: q.oracle for name, q in _ordered().items() if q.oracle is not None
    }
