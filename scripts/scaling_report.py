#!/usr/bin/env python3
"""Build the SCALING.md per-family table from two Bench JSON lines.

Usage: scaling_report.py <bench_sf0.1.json> <bench_sf1.json>

Prints a markdown table of per-query times and the sf1/sf0.1 ratio, grouped
by scaling family (the shape we EXPECT each plan to follow when the data
grows 10x: map-only ~10x at worst, aggregates ~10x, joins ~10x, dedup-family
superlinear only where the OUTPUT itself grows superlinearly by
construction of the replicated corpus).
"""
import json
import sys

FAMILIES = {
    "map-only (scan/project/filter)": [
        "q_text_quality", "q_sample_hash", "q_text_stats", "q_text_langid",
        "q_text_fingerprint", "q_multimodal_meta", "q_multimodal_frames",
        "q_embed_quantize", "q_text_repetition", "q_text_redact", "q_text_oov",
        "q_multimodal_resize", "q_multimodal_decode", "q_serde_roundtrip",
        "q_split_dataset", "q_text_chunks",
    ],
    "hash aggregate (one shuffle)": [
        "q_aggregate", "q_aggregate_salted", "q_aggregate_typed",
        "q_window_agg", "q_window_hopping", "q_session_agg", "q_text_vocab",
        "q_sketch_vocab", "q_sketch_token_dist", "q_text_token_dist",
        "q_text_top_terms", "q_text_terms_by_source", "q_text_rollup",
        "q_text_pivot", "q_embed_norms", "q_changelog_roundtrip",
        "q_serde_vat_roundtrip", "q_sketch_cms", "q_text_inverted_index",
        "q_quality_percentile_gate",
    ],
    "join (broadcast / co-located / temporal)": [
        "q_join_bucketed", "q_asof_join", "q_range_join", "q_multi_key",
        "q_multi_key_large", "q_text_rarity_join", "q_text_collocations",
        "q_text_retrieval",
    ],
    "interactive queries (serving snapshot)": [
        "q_key_query", "q_range_both", "q_range_lower", "q_range_upper",
        "q_range_unbounded", "q_filtered_range", "q_filtered_range_mixed",
        "q_window_range",
    ],
    "dedup / decontamination": [
        "q_dedup_exact", "q_dedup_near", "q_dedup_survivors", "q_dedup_simhash",
        "q_dedup_incremental", "q_decontaminate", "q_decontaminate_bloom",
        "q_dedup_containment", "q_decontaminate_score", "q_dedup_spans",
        "q_dedup_span_coverage", "q_dedup_spans_incremental",
        "q_decontaminate_spans",
    ],
    "similarity (pruned exact + audits)": [
        "q_similarity_topk", "q_similarity_knn_bounded", "q_similarity_dedup",
        "q_similarity_ann", "q_similarity_ivf",
        "q_embed_outliers",
    ],
    "sampling / packing / curation / events": [
        "q_sample_stratified", "q_sample_stratified_bounded", "q_shuffle_epoch",
        "q_pack_greedy", "q_pack_bins", "q_pack_payloads", "q_sample_mixture",
        "q_pipeline_curation", "q_pipeline_curation_full",
        "q_pipeline_training_ready",
        "q_events_funnel", "q_events_retention", "q_events_props",
    ],
    "streaming twins (replay + state)": [
        "q_streaming_snapshot", "q_statestore_query", "q_streaming_key_query",
        "q_streaming_filtered_range", "q_streaming_changelog_counts",
        "q_streaming_dedup_keys", "q_streaming_dedup_bounded",
        "q_streaming_per_record", "q_streaming_window_agg",
        "q_streaming_session", "q_streaming_funnel",
        "q_streaming_dedup_incremental", "q_streaming_join",
        "q_streaming_enriched", "q_changelog_per_record",
        "q_streaming_cdc", "q_streaming_rate_limit",
        "q_streaming_join_outer", "q_streaming_late_drop",
        "q_streaming_trending", "q_streaming_kmv",
        "q_streaming_trending_fmgws", "q_streaming_rate_limit_tws",
        "q_streaming_restore",
    ],
    "olap (star joins / rollups / window-over-agg)": [
        "q_olap_pricing", "q_olap_volume", "q_olap_priority", "q_olap_heavy",
        "q_olap_returns", "q_olap_rollup", "q_olap_backlog", "q_olap_not_in",
        "q_layout_zorder", "q_layout_linear",
    ],
    "graph (iterative / motif)": [
        "q_graph_pagerank", "q_graph_triangles", "q_graph_components",
    ],
    "feature engineering / versioning": [
        "q_features_rolling", "q_features_resample", "q_diff_snapshots",
        "q_quality_skew",
    ],
    "event analytics (sessionized / windowed)": [
        "q_events_anomaly", "q_events_bitmap", "q_events_cdc",
        "q_events_cooccurrence", "q_events_correlation", "q_events_heatmap",
        "q_events_histogram", "q_events_rate_limit", "q_events_scd2",
        "q_events_transitions", "q_events_trending",
        "q_sketch_kmv", "q_sketch_kmv_jaccard", "q_sketch_window_users",
    ],
    "text scoring (trained models / retrieval)": [
        "q_text_bm25", "q_text_perplexity", "q_text_deciles", "q_text_mlt",
        "q_text_token_dist_approx", "q_quality_blend", "q_quality_topk",
        "q_quality_expectations", "q_quality_referential",
        "q_quality_checksum",
    ],
    "dedup extensions (chunk / provenance / fuzzy / bag)": [
        "q_dedup_bag", "q_dedup_chunks", "q_dedup_chunk_overlap",
        "q_dedup_ratio", "q_dedup_source_overlap", "q_fuzzy_customers",
        "q_split_leakage", "q_curation_forget",
    ],
    "embedding clustering / mining": [
        "q_embed_clusters", "q_embed_cluster_profile", "q_embed_dim_stats",
        "q_embed_route_fine",
        "q_sample_clusters", "q_sample_importance",
        "q_similarity_negatives",
        "q_pipeline_semdedup",
    ],
    "round-9 additions (bpe / pq / matryoshka / audits)": [
        "q_text_bpe_vocab", "q_text_bpe_encode", "q_text_bpe_compression",
        "q_pack_greedy_tokens", "q_sample_rebalance", "q_sample_weighted",
        "q_embed_pq", "q_similarity_pq", "q_embed_matryoshka",
        "q_embed_matryoshka_recall", "q_dedup_lsh_curve", "q_text_keywords",
        "q_pack_length_buckets", "q_diff_embed_drift", "q_diff_drift",
        "q_split_folds",
    ],
}


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    seen = set()
    print(f"| family | query | sf0.1 s | sf1 s | ratio |")
    print(f"|---|---|---|---|---|")
    for fam, names in FAMILIES.items():
        fam_a = fam_b = 0.0
        rows = []
        for n in names:
            if n not in qa or n not in qb:
                continue
            seen.add(n)
            fam_a += qa[n]
            fam_b += qb[n]
            rows.append((n, qa[n], qb[n], qb[n] / qa[n] if qa[n] else float("nan")))
        rows.sort(key=lambda r: -r[2])
        for n, x, y, r in rows:
            print(f"| {fam} | {n} | {x:.2f} | {y:.2f} | {r:.1f}x |")
        if fam_a:
            print(f"| **{fam} (family total)** | | **{fam_a:.2f}** | **{fam_b:.2f}** | **{fam_b/fam_a:.1f}x** |")
    missing = (set(qa) | set(qb)) - seen
    if missing:
        print(f"\nunclassified: {sorted(missing)}", file=sys.stderr)
    print(f"\ntotals: sf0.1 {a['value']:.2f} s, sf1 {b['value']:.2f} s, "
          f"ratio {b['value']/a['value']:.2f}x")


if __name__ == "__main__":
    main()
