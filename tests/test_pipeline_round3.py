"""Round-3 pipeline operators: connected-components clustering,
sequence packing, vocabulary coverage, PII scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.dedup import connected_components, near_dup_clusters
from csv_query_engine_spark.pipeline.packing import sequence_packing
from csv_query_engine_spark.pipeline.text import pii_scan, vocab_coverage


def _labels(spark, edges, n_nodes, **kw):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["cluster_id"]
        for r in connected_components(nodes, e, **kw).collect()
    }


def test_connected_components_basic(spark):
    got = _labels(spark, [(1, 2), (2, 3), (5, 6)], 8)
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_connected_components_long_chain(spark):
    # A 7-node path given in the worst (descending) direction: the min
    # label must flow the whole diameter, taking several rounds.
    edges = [(i + 1, i) for i in range(6)]
    got = _labels(spark, edges, 7)
    assert set(got.values()) == {0}


def test_connected_components_no_edges(spark):
    got = _labels(spark, [], 4)
    assert got == {i: i for i in range(4)}


def test_near_dup_clusters_planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again every day " * 3
    rows = [
        (0, base),
        (1, base + " tail"),  # near-dup of 0
        (2, base + " tail two"),  # near-dup of 0 and 1
        (3, "completely different text about spark shuffles and parquet readers here"),
        (4, "another unrelated document mentioning tokenizers embeddings and lsh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in near_dup_clusters(df).collect()}
    assert len(out) == 5
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"] == 0
    assert out[0]["cluster_size"] == 3
    assert out[0]["is_survivor"] and not out[1]["is_survivor"]
    assert out[3]["cluster_id"] == 3 and out[3]["cluster_size"] == 1
    assert out[4]["is_survivor"]


def test_sequence_packing_layout(spark):
    # Known BPE-ish token counts: "a b c" -> 3 tokens, etc.
    rows = [(i, " ".join(["tok"] * n)) for i, n in enumerate([5, 3, 0, 10, 7])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # bucket_size=2 exercises the hierarchical prefix sum across buckets.
    out = {r["doc_id"]: r for r in sequence_packing(df, seq_len=8, bucket_size=2).collect()}
    starts = [out[i]["start_offset"] for i in range(5)]
    assert starts == [0, 5, 8, 8, 18]
    assert [out[i]["pack_id"] for i in range(5)] == [0, 0, 1, 1, 2]
    assert [out[i]["offset_in_pack"] for i in range(5)] == [0, 5, 0, 0, 2]
    # doc1 occupies [5,8) -> fits pack 0 exactly; doc3 occupies [8,18) ->
    # crosses the 16 boundary; empty doc2 never spans.
    assert [out[i]["spans_boundary"] for i in range(5)] == [False, False, False, True, True]


def test_sequence_packing_matches_naive_cumsum(spark):
    import itertools

    counts = [4, 9, 1, 0, 16, 2, 8, 5, 3, 11]
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["start_offset"] for r in sequence_packing(df, bucket_size=3).collect()}
    naive = [0, *itertools.accumulate(counts)][:-1]
    assert [out[i] for i in range(10)] == naive


def test_vocab_coverage_counts_and_shares(spark):
    rows = [(0, "aa aa aa bb bb cc"), (1, "aa bb dd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = vocab_coverage(df, top_k=3).orderBy("rnk").collect()
    assert [(r["term"], r["n_occ"]) for r in out] == [("aa", 4), ("bb", 3), ("cc", 1)]
    # 9 total occurrences; cc ties dd on count -> term breaks the tie.
    assert out[0]["share"] == round(4 / 9, 6)
    assert out[-1]["cum_share"] == round(8 / 9, 6)
    assert all(a["cum_share"] <= b["cum_share"] for a, b in zip(out, out[1:]))


def test_pii_scan_patterns_and_redaction(spark):
    rows = [
        (0, "contact me at jane.doe+x@example.co.uk or on 555-123-4567"),
        (1, "see https://example.com/a?b=1 and account 1234567890123"),
        (2, "a perfectly clean sentence with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1 and out[0]["has_pii"]
    assert "<EMAIL>" in out[0]["scrubbed_text"] and "<PHONE>" in out[0]["scrubbed_text"]
    assert "jane" not in out[0]["scrubbed_text"]
    assert out[1]["n_urls"] == 1 and out[1]["n_long_digits"] == 1
    assert "<URL>" in out[1]["scrubbed_text"] and "<IDNUM>" in out[1]["scrubbed_text"]
    assert not out[2]["has_pii"]
    assert out[2]["scrubbed_text"] == rows[2][1]


def test_registry_window_is_oracle_bearing(spark):
    """The driver checks exactly the first 50 queries() entries — they
    must ALL carry oracles, cover the round-9 rotations, and the full
    DRIVER_ORDER must stay in one-to-one sync with the registry."""
    from csv_query_engine_spark.queries import DRIVER_ORDER, all_oracles, all_queries

    qs = all_queries()
    oracles = all_oracles()
    names = list(qs)
    assert names == DRIVER_ORDER, "registry and DRIVER_ORDER out of sync"
    window = names[:50]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"non-oracle queries inside the driver window: {missing}"
    # Round-13 rotations IN: the three round-12 rows that had never
    # been driver-certified (round-12 verdict #1), each fully
    # oracle-paired.
    for new in (
        "dedup_funnel_rep_pairs",
        "docs_token_budget_mix_threshold",
        "embedding_contamination_banded",
        # Round-12 rotations that stay for a second round
        "dedup_minhash_survivors_rep",
        "docs_stratified_sample_threshold",
        "embedding_semantic_contamination",
        # Round-11 rotations that stay for a second round
        "orders_customer_join_ivm",
        "orders_fk_integrity_audit",
        "events_user_skew_report",
        "orders_global_row_numbers",
        "orders_schema_drift_audit",
        "orders_status_grouped_profile",
        "dedup_minhash_lsh_pairs_rep",
        # round-10-certified rows that stay for a second round
        "orders_customer_join_agg_ivm",
        "events_hll_session_overlap",
        "orders_table_profile",
        "lineitem_bloom_prefiltered_join",
        "orders_monthly_exact_quantiles",
        "customer_entity_resolution_pairs",
        "orders_hdr_price_quantiles",
        "orders_monthly_hdr_quantiles",
        "embedding_retrieval_eval",
        "customer_k_anonymity_audit",
        # round-9-certified rows that stay for a second round
        "orders_exact_quantiles_selection",
        "orders_psi_price_drift",
        "graph_khop_trade_reach",
        "events_cm_user_counts",
        "docs_shard_manifest",
        "docs_pmi_collocations",
        "docs_benchmark_decontamination",
        "media_video_dup_pairs",
        # multi-round-certified rows that stay
        "events_window_heavy_hitters",
        "events_markov_transitions",
        "docs_quality_classifier_scores",
    ):
        assert new in window, new
    # Long-standing window anchors stay certified.
    for kept in (
        "flagship_region_nation_revenue",
        "q1_pricing_summary",
        "dedup_collapse_returnflags",
        "rollup_flag_status",
        "setops_segment_overlap",
        "json_props_extract",
        "array_funcs_embeddings",
        "asof_join_last_order_before_event",
        "customer_order_gap_profile",
    ):
        assert kept in window, kept
    # Every rotated-out sibling's capability family keeps an in-window
    # row (cumulative round-6..11 mappings; see the DRIVER_ORDER notes).
    for out, kept in [
        # round-13 rotations out (the three slots for the round-12 set)
        ("dedup_minhash_survivor_clusters_rep", "dedup_minhash_survivors_rep"),
        ("docs_dsir_selection", "docs_stratified_sample_threshold"),
        ("embedding_jl_projection", "embedding_contamination_banded"),
        # families the round-13 out-rows were keepers FOR, remapped:
        ("embedding_kmeans_clusters", "embedding_semantic_contamination"),
        ("docs_group_holdout_split", "docs_stratified_sample_threshold"),
        ("docs_split_assignment", "docs_stratified_sample_threshold"),
        # round-12 rotations out (the four slots for the round-11 set)
        ("dedup_semantic_pairs", "embedding_semantic_contamination"),
        ("dedup_containment_pairs", "dedup_minhash_lsh_pairs_rep"),
        ("graph_pagerank_directed_purchases", "graph_khop_trade_reach"),
        ("embedding_hard_negatives", "embedding_retrieval_eval"),
        # round-11 rotations out (the seven slots for the round-10 set)
        ("orders_quality_constraints", "orders_fk_integrity_audit"),
        ("orders_zorder_layout_stats", "orders_global_row_numbers"),
        ("docs_sequence_packing", "docs_shard_manifest"),
        ("docs_duplicate_span_removal", "docs_benchmark_decontamination"),
        ("dedup_simhash_pairs", "dedup_minhash_lsh_pairs_rep"),
        ("media_phash_dup_pairs", "media_video_dup_pairs"),
        ("media_audio_dup_pairs", "media_video_dup_pairs"),
        # round-10 rotations out (the six slots for the round-9 set)
        ("orders_equidepth_histogram", "orders_exact_quantiles_selection"),
        ("docs_token_typo_pairs", "customer_entity_resolution_pairs"),
        ("events_hll_daily_merge", "events_hll_session_overlap"),
        # round-10 second-wave rotations out
        ("merge_upsert_customer_refresh", "orders_customer_join_agg_ivm"),
        ("events_hll_type_cardinality", "events_hll_session_overlap"),
        ("q9_profit_proxy", "q2_min_cost_supplier"),
        ("q20_dominant_part_suppliers", "q22_dormant_customer_balance"),
        ("docs_ngram_novelty", "docs_pmi_collocations"),
        ("docs_hybrid_retrieval_rrf", "embedding_retrieval_eval"),
        ("privacy_erasure_audit", "customer_k_anonymity_audit"),
        # round-9 rotations out (the 15 slots for the round-8-late set)
        ("percentiles_extprice_by_flag", "orders_exact_quantiles_selection"),
        ("events_value_anomalies", "orders_psi_price_drift"),
        ("events_robust_anomalies", "orders_psi_price_drift"),
        ("orders_incremental_agg_refresh", "orders_customer_join_agg_ivm"),
        ("scd2_customer_segment_history", "orders_customer_join_agg_ivm"),
        ("graph_triangle_part_cooccurrence", "graph_khop_trade_reach"),
        ("docs_heavy_hitter_tokens", "events_cm_user_counts"),
        ("dedup_exact_docs", "dedup_collapse_returnflags"),
        ("q16_supplier_part_variety", "q13_customer_order_distribution"),
        ("q12_ship_lag_priority", "q19_disjunctive_revenue"),
        # retrieval eval scores the BM25/cosine stack (r10 keeper move)
        ("docs_bm25_top_docs", "embedding_retrieval_eval"),
        ("customer_pseudonymized_export", "customer_k_anonymity_audit"),
        ("docs_kneser_ney_scores", "docs_pmi_collocations"),
        # round-7 rotations out (keepers updated where the round-9
        # rotation moved the family row)
        ("graph_pagerank_trade_network", "graph_khop_trade_reach"),
        ("docs_lang_id", "docs_quality_classifier_scores"),
        ("docs_unigram_lm_scores", "docs_pmi_collocations"),
        ("docs_bigram_lm_scores", "docs_pmi_collocations"),
        ("embedding_topk_bruteforce", "embedding_retrieval_eval"),
        ("events_hourly_counts", "events_window_heavy_hitters"),
        ("events_funnel_steps", "events_markov_transitions"),
        # round-8 sibling swaps
        ("events_conversion_attribution", "events_window_heavy_hitters"),
        ("scd2_snapshot_asof", "orders_customer_join_agg_ivm"),
        ("docs_chunk_windows", "docs_shard_manifest"),
        # late round-7 sibling swaps
        ("docs_quality_filter", "docs_quality_classifier_scores"),
        ("docs_vocab_coverage", "embedding_retrieval_eval"),
        ("dedup_allpairs_jaccard", "dedup_minhash_lsh_pairs_rep"),
        # round-6 rotations out (families unchanged)
        ("join_kinds_outer", "q13_customer_order_distribution"),
        ("anti_join_parts_never_ordered", "q22_dormant_customer_balance"),
        ("correlated_scalar_subquery", "q2_min_cost_supplier"),
        ("q4_priority_late_ship", "q22_dormant_customer_balance"),
        ("q6_forecast_revenue", "q19_disjunctive_revenue"),
        ("q7_nation_trade_volume", "q2_min_cost_supplier"),
        ("q8_market_share", "q2_min_cost_supplier"),
        ("q15_top_supplier", "q11_important_parts"),
        ("q17_small_quantity_revenue", "q2_min_cost_supplier"),
        ("q18_volume_customers", "q3_shipping_priority"),
        ("q10_returned_item_report", "q3_shipping_priority"),
        ("q14_promo_revenue_share", "q19_disjunctive_revenue"),
        ("q5_local_supplier_volume", "flagship_region_nation_revenue"),
        ("window_lag_order_gaps", "window_range_frame_moving_sum"),
        ("events_sessionization", "events_markov_transitions"),
        ("docs_repetition_stats", "docs_quality_classifier_scores"),
        ("docs_char_entropy", "docs_quality_classifier_scores"),
        ("docs_tfidf_top_terms", "docs_pmi_collocations"),
        ("dedup_incremental_admission", "dedup_minhash_survivors_rep"),
        ("docs_dataset_card", "docs_quality_classifier_scores"),
        ("embedding_centroids_by_label", "embedding_semantic_contamination"),
        ("docs_token_budget_mix", "docs_token_budget_mix_threshold"),
        # late round-8 rotations out
        ("q21_sole_late_shipper", "q22_dormant_customer_balance"),
        ("range_join_shipments_within_month", "asof_join_last_order_before_event"),
        ("docs_udtf_sentences", "customer_order_gap_profile"),
        ("dedup_cluster_canonical", "dedup_minhash_survivors_rep"),
        ("docs_shard_assignment", "docs_shard_manifest"),
        ("customer_snapshot_cdc_diff", "orders_customer_join_agg_ivm"),
    ]:
        assert out not in window and kept in window, (out, kept)


def test_quantized_topk_recall_vs_bruteforce(spark):
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.pipeline.similarity import brute_force_topk, quantized_topk

    e = load_tables(spark, "/root/testdata/sf0.001", ("embeddings",), register=False)["embeddings"]
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = {
        (r["query_id"], r["cand_id"]) for r in brute_force_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"]) for r in quantized_topk(e, q, k=5).collect()
    }
    assert len(approx) == len(exact)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"quantized recall {recall:.2f} vs brute force"


def test_quantized_topk_scores_are_exact_for_hits(spark):
    """Every emitted (query, cand) score must equal the exact cosine —
    quantization may only affect WHICH candidates surface, not scores."""
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.pipeline.similarity import brute_force_topk, quantized_topk

    e = load_tables(spark, "/root/testdata/sf0.001", ("embeddings",), register=False)["embeddings"]
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in brute_force_topk(e, q, k=15).collect()
    }
    for r in quantized_topk(e, q, k=5).collect():
        key = (r["query_id"], r["cand_id"])
        if key in exact:
            assert abs(r["cosine"] - exact[key]) < 1e-12


def test_incremental_dedup_verdicts(spark):
    from csv_query_engine_spark.pipeline.dedup import incremental_dedup

    base = "the quick brown fox jumps over the lazy dog again and again every day " * 3
    corpus = spark.createDataFrame(
        [(1, base), (2, "some other corpus document about window functions and joins here")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, base),            # exact dup of 1
            (11, base + " tail"),  # near dup of 1
            (12, "entirely novel content mentioning broadcast thresholds and shuffles"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in incremental_dedup(incoming, corpus).collect()}
    assert out[10]["verdict"] == "exact_dup" and out[10]["dup_of"] == 1
    assert out[11]["verdict"] == "near_dup" and out[11]["dup_of"] == 1
    assert out[12]["verdict"] == "admit" and out[12]["dup_of"] == -1


def test_spread_is_identity_for_parallel_inputs(spark):
    """_spread must NOT reshuffle an input that is already at session
    parallelism — at 100 TB the scan arrives with thousands of splits
    and an unconditional repartition would shuffle the raw corpus."""
    from csv_query_engine_spark.pipeline.text import _spread

    p = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(p + 4)
    assert _spread(wide) is wide
    narrow = spark.range(1000).coalesce(1)
    assert _spread(narrow).rdd.getNumPartitions() == p


def test_queries_survive_multifile_layout(spark, tmp_path):
    """Results must be layout-independent: the same documents data split
    across 8 parquet files (the realistic many-split scan) must produce
    byte-identical results to the single-file harness layout."""
    from csv_query_engine_spark.queries import all_queries

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    multi_dir = tmp_path / "documents.parquet"
    src.repartition(8).write.mode("overwrite").parquet(str(multi_dir))

    qs = all_queries()
    for name in ("docs_quality_filter", "dedup_exact_docs", "docs_vocab_coverage", "docs_sequence_packing"):
        single = [tuple(r) for r in qs[name](spark, "/root/testdata/sf0.001").collect()]
        multi = [tuple(r) for r in qs[name](spark, str(tmp_path)).collect()]
        assert multi == single, f"{name} changed under multi-file layout"
