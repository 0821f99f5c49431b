"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are served from the engine's query
registry (cc_pyspark_spark.plans.registry) — one entry per implemented
operator from SURVEY.md §2 plus the beyond-reference LLM-pipeline
operators.

The round-1 driver checked exactly the first 50 entries in dict order,
so ``queries()`` emits a curated priority block first: the benchmark
headliners (TPC-H), the full dedup/text/similarity/events surface, and
one representative per relational operator family. Redundant micro-
queries (extra set ops, grouping-set variants, window-frame twins, …)
come after the cutoff — they remain registered, exported, and verified
by the local DuckDB-parity pytest either way.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cc_pyspark_spark.plans import QUERIES

#: Names the per-round driver gate must see first (its cap is 50).
#:
#: The fixed EIGHT-query headliner core (TPC-H spine, scale-dedup,
#: IVF ANN, session windows, BPE, curation e2e) is a subset of
#: ``bench.HEADLINERS`` (which benches far more), so every
#: driver-gated core name is also perf-gated every round.  The core
#: shrank 12 -> 8 during r9 to free rotation slots; the authoritative
#: count is ``len(DRIVER_CORE)`` below, and the rotation window is
#: ``50 - len(DRIVER_CORE)`` slots.  r9 change inside the core (VERDICT r8 ask
#: #2): the embedding-dedup slot now runs dedup_embedding_scale_wide —
#: the production 16-bit x 8 sign-LSH geometry — and the 4-bit demo
#: formerly named dedup_embedding_scale is re-registered as
#: dedup_embedding_fixture (unbenched, rotation slot below), so the
#: `scale` tag and the benched name always denote deployed geometry.
#:
#: Round-10 rotation (VERDICT r9 ask #1, executing the committed r10
#: plan): the 42 non-core slots take (a) ALL 24 remaining r2-stale
#: names — after r10 no driver row predates r5 — plus (b) first rows
#: for ALL THIRTEEN names new in r10 (wat_links_host_graph,
#: text_classifier_train_sparse, curation_domain_cap,
#: curation_token_budget_mix, text_vocab_coverage,
#: dedup_url_canonical, graph_hits, sim_mmr_rerank,
#: multimodal_tar_index, curation_mix_execute, sim_bitext_mine,
#: text_kneser_ney_bigram, multimodal_zip_probe), and (c) five
#: refresh slots for r8-last-row names (curation_pack_sequences,
#: text_word_count_tfdf, dedup_exact, embedding_pq_codes,
#: sim_ann_pq_adc).
#:
#: Round-11 rotation (VERDICT r10 ask #1) — OLDEST-FIRST, which
#: deviates from the verdict's named list deliberately: the verdict
#: asked for the r8-last-row cohort and "no driver row predates r8
#: after r11", but the last-row ledger (CORRECTNESS_r01..r10) shows
#: the stalest rows are the r5 cohort (8 names), then r6 (25), then
#: r7 (26) — 59 pre-r8 names in total, more than the 42 slots one
#: round has, so the verdict's floor is unreachable as stated.
#: Rotating strictly oldest-first lifts the floor from r5 to r7 in
#: one round (all r5 + all r6 names re-pass here, plus the 6
#: alphabetically-first r7 names); the remaining 20 r7 names and the
#: verdict's r8 cohort head the r12 plan. New r11 registrations
#: (graph_lpa_converged, graph_kcore_converged,
#: curation_quota_semantics) take first-row slots per the tripwire.
#:
#: r12 rotation plan (in priority order): (a) ALL 26 r7-last-row
#: names — agg_approx_count_distinct, agg_approx_percentile_bound,
#: agg_count_min_heavy_hitters, agg_exact_median_histogram,
#: agg_hll_sketch_union, agg_salted_distinct_count (the six displaced
#: from r11's tail by new registrations) plus
#: curation_pipeline_full, dedup_prefix_jaccard, dedup_simhash_pairs,
#: events_funnel_conversion, events_gapfill_locf,
#: events_hypertable_rollup, events_retention_cohorts,
#: events_rolling_zscore, graph_pagerank, graph_triangle_stats,
#: sim_ann_pq_rerank, sim_hybrid_rrf, sim_sparse_tfidf_topk,
#: text_bigram_lm_score, text_drift_chi2, tpch_q13/q17/q21/q2,
#: warc_source_payload_digest; then (b) the r8 cohort (tpch_q3/q4/q5/
#: q6/q10/q14/q18, sim_cosine_topk, dedup_simhash_scale,
#: events_tumbling_hourly, text_gopher_rules, ...). Steady-state
#: full-registry cycle ~4-5 rounds at 197 registered queries. Each
#: rotated-out name stays green in the sf0.001 parity pytest
#: meanwhile.
DRIVER_CORE: tuple[str, ...] = (
    # -- fixed 8-headliner core: benched AND driver-gated every round
    #    (stable since r9; every former core name remains benched and
    #    cycles through the rotation slots) --
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
    # -- first rows for the new r11 names (the rotation tripwire's
    #    every-new-name-gets-a-row invariant): the two converged
    #    deployment wrappers under the oracle gate (VERDICT r10 ask
    #    #3) and the batch-vs-streaming quota-semantics contract
    #    (ask #7) --
    "graph_lpa_converged",
    "graph_kcore_converged",
    "curation_quota_semantics",
    # -- ALL 8 r5-last-row names (stalest in the ledger) --
    "curation_hash_sample",
    "curation_split_assign",
    "dedup_cluster_canonical",
    "dedup_semantic_clustered",
    "dedup_url_normalize",
    "embedding_quantize_int8",
    "text_token_rarity",
    "url_host_reverse",
    # -- ALL 25 r6-last-row names --
    "curation_mix_weights",
    "curation_pack_sequences_bpe",
    "curation_pii_redact",
    "curation_reservoir_per_lang",
    "dedup_substring_spans",
    "events_asof_join",
    "events_range_join",
    "merge_upsert",
    "multimodal_audio_features",
    "multimodal_blob_stats",
    "multimodal_decode_resize",
    "scan_filter_project",
    "sql_passthrough",
    "text_c4_line_rules",
    "text_html_extract",
    "tpch_q11_important_parts",
    "tpch_q12_priority_shipping",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_potential_promotion",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "url_tld_validation_counts",
    "window_distributed_ids",
    # -- 6 oldest r7-last-row names (alphabetical head; the other 20
    #    r7 names lead the r12 plan). New r11 registrations displace
    #    from THIS block first. --
    # Six new r11 registrations (CCNet paragraph dedup, tokenizer
    # fertility, strided chunking, cluster-size histogram, degree
    # assortativity, LSH blow-up report) displaced the whole
    # 6-name r7 head block (agg_approx_count_distinct,
    # agg_approx_percentile_bound, agg_count_min_heavy_hitters,
    # agg_exact_median_histogram, agg_hll_sketch_union,
    # agg_salted_distinct_count) back to the r12 queue per the
    # displacement rule above.
    "dedup_paragraph",
    "text_tokenizer_fertility",
    "curation_chunk_overlap",
    "dedup_cluster_histogram",
    "graph_degree_assortativity",
    "dedup_lsh_blowup_report",
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
