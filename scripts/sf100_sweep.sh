#!/bin/bash
# sf100 sweep: chunk R = merge+stream gates (re-measured on the r16 tree), chunks 1-4 =
# the remaining unmeasured entries, alphabetical. One JVM per chunk (Bench writes
# its JSON only at completion, so chunking keeps a multi-hour sweep crash-safe).
# Usage: sf100_sweep.sh [chunk ...]   (default: R 1 2 3 4)
set -e
SF=${SF_DIR:-/root/repo/bench-data/sf100}
OUT=${OUT_DIR:-/root/repo/bench_sf100_chunks}
mkdir -p "$OUT"
declare -A CHUNKS
CHUNKS[R]="incr_merge_partitioned,incr_merge_hashkeys,incr_merge_manifest,stream_merge_partitioned,stock_stream_dim,stream_ann_ingest,stream_dedup_docs,stream_hourly_rollup,stream_join_views,stream_merge_events"
CHUNKS[1]="deciles_orders,dedup_containment,dedup_embedding,dedup_embedding_groups,dedup_embedding_ivf,dedup_exact,dedup_groups,dedup_incremental,dedup_jaccard,dedup_jaccard_prefix,dedup_keep,dedup_keep_best,dedup_minhash_fast,dedup_minhash_lsh,dedup_simhash,dedup_threshold_sweep,diversity_distinct_n,dup_inflation,dup_source_matrix,e_hourly_rollup,e_json_rollup,embed_abtt_labels,embed_label_centroids,embed_outliers,embed_pca_stability,embed_pca_top,entropy_profile,event_transitions,exact_median_by_type,exact_quantiles_totalprice,f20_bins_acctbal,feat_lang_profile,funnel_stages"
CHUNKS[2]="fuzzy_pairs_customers,gapfill_daily,graph_triangles,grid_median_events,heavy_hitter_tokens,hll_daily_users,hll_distinct_events,hll_persist_merge,hybrid_rrf,incr_load_events,ivfadc256_recall,ivfadc_recall,ivfadc_recall_d256,j3_upsert_users,kcore_docs,keywords_per_source,kmeans_cells,kmv_daily_users,kmv_distinct_events,kmv_persist_merge,kmv_rolling_users,kmv_user_overlap,kpi_unpivot,lm_backoff,lm_surprisal,lsh_pair_recall,m1_stg_events,m2_dim_users,mad_outliers,mad_outliers_by_type,mi_flag_status,minhash_fast_precheck,mix_budget"
CHUNKS[3]="mix_temperature,mm_audio_signature,mm_image_dhash,mm_payload_stats,mm_video_framehash,orc_roundtrip_read,pack_plan,pagerank_hubs,passage_dup,pivot_daily_types,pq256_recall,pq_distortion,pq_recall,pq_recall_d256,profile_events,psi_drift_total,psi_value_drift,q1_top_brands,q2_daily_trend,q3_zscore_outliers,q4_geo_rollup,q5_risk_watchlist,qa_counts_events,range_views_before_purchase,rarity_profile,recon_orders_events,rolling_median_value,rp_distortion,s13_fact_prune,sample_per_lang,sample_priority,sample_priority_lang,sample_strata"
CHUNKS[4]="scd2_user_versions,semdedup_prune,sessionize_daily,shard_plan,sim_topk,sim_topk_ivf,sim_topk_ivf_kmeans,sim_topk_ivfadc,sim_topk_lsh,sim_topk_pq,sim_topk_pq256,sim_topk_q8,skew_salted_rollup,source_mix_summary,split_leakage_pairs,split_train_val_test,stock_dim_entity,stock_dim_entity_scalable,stock_fct_observations,stock_normalize_quotes,stock_q1_top_market_cap,stock_q2_daily_trend,stock_q3_volume_outliers,stock_q4_geo,stock_q4_geo_scalable,stock_q5_risk_watchlist,stock_quality_suite,stock_raw_qa,stock_stg,stock_u1_filters"
for c in ${@:-R 1 2 3 4}; do
  echo "=== chunk $c ===" >&2
  # spark.local.dir back on disk for the decade: sf100 shuffle volume
  # (tens of GB of dead blocks between GC ticks) must not sit in the
  # RAM-backed default Sessions picks for oracle-SF runs
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=${CHUNKS[$c]} SPARK_GRAFT_GC_BETWEEN=1 \
    SPARK_GRAFT_BENCH_OUT=$OUT/chunk_r16_$c.json SPARK_DRIVER_MEM=96g \
    SPARK_GRAFT_EXTRA_CONF="spark.local.dir=${SPARK_LOCAL_DIR:-/tmp}" \
    /root/repo/scripts/run_graft.sh graft.Bench || echo "chunk $c FAILED" >&2
done
