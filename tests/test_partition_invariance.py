"""Results must not depend on physical partitioning.

The oracle compare runs at one fixed partitioning; these tests vary
`spark.sql.shuffle.partitions` and the input's partition count and
assert bit-identical results — catching accidental order-dependence
(first/collect_list without sort, float fold order, id assignment) that
a single-layout comparison cannot see. Queries chosen are the ones with
ordering-sensitive internals: dedup keep-first (min-struct), greedy
packing (applyInPandas state), distributed id assignment, C4 first-site
keeps, substring-span joins, SimHash banding.
"""

from __future__ import annotations

import pytest

from cc_pyspark_spark.plans import QUERIES
from tests.conftest import SF_DIR

CHECK = [
    "dedup_exact",
    "window_distributed_ids",
    "curation_pack_sequences",
    "dedup_substring_spans",
    "text_c4_line_rules",
    "dedup_simhash_pairs",
    "curation_pipeline_e2e",
    "curation_mix_weights",
    # r7 (ADVICE r6): the ADC distance sum now folds per-block distances
    # in block order — pin that the last-ulp result survives re-layout.
    "sim_ann_pq_adc",
    # r7: per-doc mean probability folds a position-sorted array — the
    # only float aggregation in the LM scorer.
    "text_bigram_lm_score",
    # r7: ADC fold + exact-cosine rerank — two float stages, both
    # explicit-order.
    "sim_ann_pq_rerank",
    # r7: token-ordered folds for norms and dots in the sparse scorer.
    "sim_sparse_tfidf_topk",
    # r7 continuation: fixed-point integer PageRank (associative BIGINT
    # sums are the whole point — this is the direct pin).
    "graph_pagerank",
    # r7 continuation: bucket-pruned ADC — same ordered fold as
    # sim_ann_pq_adc plus the assignment argmin.
    "sim_ann_ivf_pq",
    # r7 continuation: tie-free floor fixed-point centroid sums across
    # two Lloyd rounds; any order-dependence compounds per round.
    "embedding_kmeans_lloyd",
    # r7 continuation: integer CDF algebra over the range-partitioned
    # prefix scan (one range exchange whose layout must not matter).
    "events_ks_drift",
    "events_cusum_changepoint",
    # r8: the sign-LSH family's two verify strategies both fold cosines
    # in dimension order (numpy per-bucket vs JVM zip_with) — re-layout
    # must not perturb the last ulp on either path, nor the
    # Hamming-1-probed candidate set.
    "dedup_embedding_fixture",
    "dedup_embedding_scale_wide",
    "dedup_embedding_scale_probe",
    "dedup_embedding_delta",
    # r8: residual-domain ADC — coarse assignment + residual fold.
    "sim_ann_ivfpq_residual",
    # r8: star-alternation CC (pure integer min-algebra; the direct pin
    # that round count and layout cannot interact).
    "graph_cc_alternating",
    # r9: the auto-convergence wrapper — layout must not change WHERE
    # the fixed point lands, only (possibly) which round finds it.
    "graph_cc_converged",
    # r9: DSIR weights fold per-doc terms in bucket order and gate on
    # an interpolated median of doubles — both must survive re-layout.
    "curation_dsir_importance",
    # r9: novelty is an integer ratio; the pin is on the semi-join
    # candidate set being layout-independent.
    "text_ngram_novelty",
    # r9: greedy farthest-point rounds — a layout-dependent top-1 in
    # ANY round would cascade into different centers everywhere.
    "embedding_kcenter_coreset",
    # r9: the bitmap-Bloom twin — the bit_or word aggregation and the
    # double ratio must survive re-layout bit-for-bit.
    "text_ngram_novelty_bloom",
    # r9 late: BM25 folds per-query-term contributions in token order;
    # the JL projection folds 64 signed terms in dimension order (map-
    # only, but the zip_with fold is still a float chain worth pinning).
    "sim_bm25_topk",
    "embedding_random_projection",
    # r9 late: KMV bottom-k sketches — integer hashes, but the window
    # rank and array set-algebra must not depend on layout.
    "agg_theta_sketch_intersect",
    # r9 late: priority sampling's global top-(k+1) head and tau
    # broadcast; hard-negative cosine folds + per-anchor max.
    "curation_priority_sample",
    "sim_hard_negatives",
    # r9 late: batch-GD trainer — fixed-point gradient/moment sums and
    # the bucket-ordered zip_with z-fold are the associativity claims;
    # any layout dependence compounds across the three rounds.
    "text_classifier_train",
    # r9 late: the eval twin — a doc whose z sits near 0 would flip a
    # confusion-matrix cell if the fold order ever became layout-
    # dependent.
    "text_classifier_eval",
    # r10: the sparse twin — the O(nnz) gradient aggregation and the
    # idx-ordered sparse z/C folds replace the dense array fold; the
    # factored-E gradient must survive re-layout bit-for-bit too.
    "text_classifier_train_sparse",
    # r11: keep-first paragraph dedup (min-BIGINT keeper per digest)
    # and the pos-sorted reconstruct — both must be layout-free.
    "dedup_paragraph",
    # r11: fertility ratios are single int/int divisions of summed
    # totals — the pin is that the sums (and thus the doubles) never
    # see a float fold.
    "text_tokenizer_fertility",
    # r12 (VERDICT r11 ask #6): Newman assortativity r is a double
    # derived row-level from six exact BIGINT scalar sums — invariant
    # by construction, but pinned here like every other float-emitting
    # query instead of argued.
    "graph_degree_assortativity",
    # r12: the capped pair join emits jac doubles AND its window-count
    # cap decision must not depend on layout.
    "dedup_minhash_capped",
    # r12: the salt twin adds a row_number sub-bucket split — the
    # doc_id-ordered window must assign identical subs at any layout.
    "dedup_minhash_salted",
    # r12 late: containment/jac doubles are single divisions of exact
    # BIGINT intersection counts — pin that the DF-capped index (and
    # thus the counts) is layout-free.
    "dedup_containment",
    # r12 late: the SCD2 interval build stacks two windows and an
    # island agg on one user_id ordering; the decimal(18,6)->double
    # click_value sum must survive re-layout exactly.
    "events_scd2_asof",
    # r12 late: boiler_frac is a ratio of exact BIGINT occurrence
    # sums; the per-source DF threshold decision must be layout-free.
    "text_boilerplate_shingles",
    # r12 late: jac is one division of exact BIGINTs — the pin is on
    # the hub-capped candidate set (and cn counts) being layout-free.
    "graph_link_prediction",
    # r12 late: open/close come from a struct-min/max total order —
    # layout must not change which event wins a bar's endpoints.
    "events_ohlc_bars",
    # r12 late: epoch ranks ride the W2 range shuffle (reservoir-
    # sampled boundaries) — ids must equal the global-window oracle at
    # ANY input layout, same claim window_distributed_ids pins.
    "curation_epoch_shuffle",
    # r12 late: same token-ordered float folds as the unpruned sparse
    # family PLUS the impact window — the top-64-per-token decision
    # (w DESC, doc_id) must be layout-free.
    "sim_sparse_impact_topk",
    # r12 late: host ranks are exact BIGINT fixed-point (rank is one
    # exact BIGINT->double conversion); the pin covers the dangling-
    # mass aggregate — an integer sum, layout-free by associativity —
    # through the full WAT-parse -> pagerank composition.
    "wat_host_pagerank",
    # r12 late: recall is one division of exact BIGINT counts; the pin
    # covers the band self-join candidate set and the direct shingle-
    # self-join truth set (commit 4e1ee29 replaced the PPJoin truth
    # path) both being layout-free.
    "dedup_lsh_recall_eval",
]


def _rows(spark, name):
    df = QUERIES[name].spark(spark, SF_DIR)
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", CHECK)
def test_shuffle_partition_invariance(spark, name):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert a == b, f"{name} depends on shuffle partition count"


def test_input_partitioning_invariance(spark):
    """Operator frames fed differently-partitioned inputs agree."""
    from cc_pyspark_spark.operators.dedup import (
        exact_dedup_keep_first,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from cc_pyspark_spark.plans.c4 import c4_clean_frame
    from cc_pyspark_spark.plans.curation import pack_sequences_frame

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    shuffled = docs.repartition(13)

    def rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())

    for fn in (
        lambda d: exact_dedup_keep_first(d, ["text"], "doc_id"),
        lambda d: minhash_lsh_pairs(d, threshold=0.5),
        lambda d: simhash_pairs(d),
        c4_clean_frame,
        pack_sequences_frame,
    ):
        assert rows(fn(docs)) == rows(fn(shuffled)), fn
