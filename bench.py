"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed via a noop sink (no driver-side
materialization of results — mirrors how a cluster job would terminate in
a table write). One tiny warmup action absorbs JVM/codegen startup so the
numbers measure the queries, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fluss_iceberg_spark import registry
from fluss_iceberg_spark.session import get_spark

# Curated headline set (extend as operators land). Anything listed here but
# not (yet) registered is skipped, so bench.py never breaks mid-build.
HEADLINE = [
    "ref_enriched_orders",
    "ref_nation_revenue",
    "ref_top5_nations",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q22_inactive_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "sql_region_revenue",
    "window_top_customer_per_nation",
    "window_running_revenue",
    "window_revenue_quartiles",
    "agg_priority_distribution",
    "agg_rollup_status_priority",
    "agg_cube_status_priority",
    "agg_pivot_status_by_priority",
    "set_ops_customers",
    "events_hourly_rollup",
    "events_sliding_rollup",
    "events_session_window_builtin",
    "events_asof_attribution",
    "events_error_burst",
    "events_sessionize",
    "events_dedup_latest",
    "lake_upsert_customers",
    "lake_union_read",
    "lake_pk_union_read",
    "lake_time_travel",
    "lake_maintenance_lifecycle",
    "lake_incremental_read",
    "lake_file_skipping",
    "lake_partition_pruning",
    "lake_clustered_scan",
    "lake_row_level_ops",
    "lake_mor_delete",
    "lake_pk_changelog",
    "stream_nation_revenue",
    "stream_stateful_sessions",
    "stream_exact_dedup",
    "stream_log_appends",
    "stream_pk_changelog",
    "stream_enriched_union",
    "stream_events_hourly",
    "stream_interval_join",
    "faker_pipeline_top5",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "text_tfidf_top_terms",
    "text_quality_score",
    "text_lang_id",
    "text_token_stats",
    "text_bpe_token_count",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_embedding_hygiene",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_resize_features",
    "agg_price_percentiles",
    "agg_price_percentiles_approx",
    "agg_approx_distinct_customers",
    "text_pii_scrub",
    "text_pack_sequences",
    "text_stratified_sample",
    "text_repetition_filter",
    "dedup_decontaminate",
    "dedup_source_overlap",
    "text_unigram_lm_score",
    "text_budget_mixing",
    "pipeline_curation_end2end",
    "dedup_semantic_representatives",
    "join_skew_salted",
    "source_formats_roundtrip",
    "engine_show_create",
    "engine_time_travel_sql",
    "engine_timestamp_travel",
    "engine_merge_into",
    "dedup_passage_level",
    "export_training_shards",
    "text_ngram_stats",
    "lake_matview_refresh",
    "lake_matview_changelog",
    "stream_matview_refresh",
    "stream_watermarked_dedup",
    "lake_value_set_skipping",
    "ann_kmeans_clusters",
    "dedup_semdedup",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ref_count_orders",
    "ref_max_orderdate",
    "ref_notnull_drop",
    "tpch_q12_priority_by_returnflag",
    "tpch_q16_supplier_cnt",
    "tpch_q20_excess_suppliers",
    "window_order_gaps",
    "window_moving_avg_price",
    "window_nation_rank",
    "events_json_extract",
    "lake_snapshots",
    "lake_cold_vs_union_counts",
    "text_fingerprint",
    "events_gap_fill",
    "events_funnel",
    "events_retention_cohorts",
    "fuzzy_part_names",
    "agg_grouping_sets",
    "agg_unpivot_measures",
    "stream_left_interval_join",
    "stream_txn_two_sinks",
    "lake_cdc_mirror",
    "stream_full_interval_join",
    "events_anomaly_zscore",
    "agg_grouping_id",
    "text_budget_two_phase",
    "text_temperature_mixing",
    "stream_wap_gated",
    "events_value_percentiles",
    "events_value_histogram",
    "stream_neardup_admission",
    "text_chunk_passages",
    "lake_scd2_dimension",
    "lake_scd2_changes",
    "lake_runtime_filter_join",
    "multimodal_real_decode",
    "lake_spj_bucket_join",
    "ann_ivf_index_incremental",
    "text_weighted_sample",
    "ann_index_cdc_sync",
    "dedup_substring_spans",
    "text_quality_topq",
    "text_bigram_coherence",
    "text_domain_cap",
    "dedup_substring_rewrite",
    "multimodal_png_pixel_stats",
    "multimodal_ahash_dedup",
    "multimodal_ahash_neardup_pairs",
    "multimodal_audio_features",
    "multimodal_gif_frames",
    # round 9: video container modality (ISO-BMFF), BPE tokenizer,
    # graph centrality, model-based quality filtering
    "multimodal_mp4_metadata",
    "multimodal_mp4_frame_stats",
    "multimodal_mp4_keyframe_stats",
    "multimodal_video_scene_cuts",
    "text_bpe_roundtrip",
    "text_bpe_train_merges",
    "text_classifier_score",
    "text_classifier_train",
    "graph_pagerank",
    "graph_top_authorities",
    "graph_hits_scores",
    "stream_classifier_gate",
    "text_gopher_rules",
    "text_compression_ratio",
    # round-10 additions
    "graph_components",
    "text_perplexity_filter",
    "multimodal_phash",
    "multimodal_audio_spectrum",
    "dedup_kmv_source_setops",
    "dedup_quantile_sketch",
    "lake_ivm_join_view",
    "lake_ivm_retract_view",
    "stream_ivm_join",
    "text_cms_heavy_hitters",
    # round-11 additions
    "dedup_hll_distinct",
    "events_tdigest_quantiles",
    "stream_sketch_refresh",
    "lake_zorder_skipping",
    "text_keyword_search",
    "stream_tdigest_refresh",
    "text_bm25_search",
    "events_funnel_steps",
    "engine_approx_distinct",
    "ann_filtered_topk",
    "text_hybrid_rrf_search",
    "ann_maxsim_multivector",
    "ann_sq8_topk",
    "text_index_incremental",
    # round-12 second-wave additions
    "graph_triangle_counts",
    "ann_sq8_rerank",
    "export_epoch_shuffle",
    "events_seasonal_anomaly",
    "dedup_cdc_chunks",
    "join_range_bands",
    "export_leakage_safe_split",
    "stream_cdc_chunk_census",
    "dedup_cdc_rewrite",
]


def _execute(df) -> None:
    """Run the full plan without collecting results to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry.load_all()
    spark = get_spark(app_name="fluss-iceberg-spark-bench")

    # warmup: JVM / codegen / parquet footer caches
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    names = [n for n in HEADLINE if n in registry.QUERIES]
    # Best-of-N per query (default 2): a single cold run is hostage to one
    # slow JIT/GC/IO window on this noisy box (observed ~2× run-to-run
    # swings); the best of two adjacent runs is a far more stable estimate
    # of the plan's actual cost. Queries are required to be idempotent
    # per call (scratch lake tables rebuild under /tmp), so re-running is
    # safe.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    # Session recycle (r8 adjudication of ann_pq_topk's in-suite
    # inflation): late-suite queries can read 2-5× slower than standalone
    # purely from accumulated JVM heap/codegen-cache pressure — a harness
    # artifact, not a plan cost (controlled A/B: recycling every 60
    # queries left the per-query MEDIAN at 0.994× but cut the late-suite
    # positions 17%, SCALE.md r8). Default ON so every query is measured
    # in a comparably-fresh session; the restart time is NOT attributed
    # to any query (the headline is the sum of per-query times). 0 = off.
    # r9 re-adjudication: at 60 the embedding-kernel queries sitting
    # 40+ positions into a block (ann_pq/ivfpq at 106/107) still read
    # 2-4x their fresh-session times on today's environment (standalone
    # warm runs: pq 1.8-2.4 s vs 5.3 s in-suite best-of-2), while a
    # surgical kmeans->semdedup->pq session shows no inflation — the
    # pressure accumulates with block length. 45 puts every query
    # within ~45 queries of a fresh JVM for one extra restart (~10 s,
    # unattributed).
    recycle = int(os.environ.get("SPARK_GRAFT_SESSION_RECYCLE", "45"))
    # Suite passes (r9): host contention arrives in minutes-long windows
    # that clobber whatever queries run inside them — adjacent best-of-2
    # cannot escape a window that outlasts both attempts (observed: the
    # same suite produced 2-7x spikes on DIFFERENT position clusters in
    # three same-day runs). A second full pass ~25 min later is
    # temporally decorrelated; per-query min across passes removes the
    # window without touching any query's plan. Self-describing via
    # "suite_passes" in the record.
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "1")))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for pass_i in range(passes):
        if pass_i:
            spark.stop()
            spark = get_spark(app_name="fluss-iceberg-spark-bench")
            spark.read.parquet(f"{sf_dir}/nation.parquet").count()
        for qi, name in enumerate(names):
            if recycle and qi and qi % recycle == 0:
                spark.stop()
                spark = get_spark(app_name="fluss-iceberg-spark-bench")
                spark.read.parquet(f"{sf_dir}/nation.parquet").count()
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                try:
                    _execute(registry.QUERIES[name](spark, sf_dir))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                except Exception as ex:  # one broken query must not zero the bench
                    errors[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
                    print(f"BENCH ERROR {name}: {errors[name]}", file=sys.stderr)
                    break
                # evict caches a query persisted for its own multi-branch plan —
                # stale blocks otherwise pile up across the run and push later
                # queries into eviction/recompute churn
                spark.catalog.clearCache()
            # a query that errored on ANY run is an error, full stop — a
            # green first run must not mask a non-idempotent failure by
            # counting its time in the headline total
            if best is not None and name not in errors:
                prev = timings.get(name)
                timings[name] = round(best if prev is None else min(prev, best), 3)

    # a query that errored on ANY pass is an error, full stop — with
    # passes>1 a green pass-1 timing must not survive a pass-2 failure
    # into the headline total
    for name in errors:
        timings.pop(name, None)
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "runs_per_query": runs,
        # harness mode matters for cross-record comparisons (~8% of
        # total wall at sf0.1) — records must be self-describing
        "session_recycle": recycle,
        "suite_passes": passes,
    }
    if errors:
        result["errors"] = errors
    line = json.dumps(result)
    # file copy first, then stop the session, then print the headline as
    # the ABSOLUTE last stdout line: a bounded tail capture gets the line
    # unpolluted by session-shutdown output, and the file copy survives
    # even if stdout is truncated (the r12→r13 PERF seam: BENCH_r11's
    # tail cut the line mid-dict and the driver lost the round-over-round
    # comparison)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_result.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    print(line)


if __name__ == "__main__":
    main()
