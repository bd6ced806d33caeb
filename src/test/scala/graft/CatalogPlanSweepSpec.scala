package graft

/** Catalog-WIDE plan hygiene: every query in `SparkEntry.queries` is
  * planned at sf0.001 and screened for the patterns that die at 100×
  * scale, regardless of how fast they run at bench SF:
  *
  *  - `CartesianProduct` — O(n·m) pairs; never acceptable here (every
  *    candidate generator is banded/bucketed by design).
  *  - `BroadcastNestedLoopJoin` — O(n·m) compares; acceptable ONLY for
  *    the survey's J2 pattern (crossJoin with a broadcast scalar/stat
  *    frame whose cardinality is O(1) by construction — a grand
  *    aggregate, a quantile-cut row, a τ threshold). Those sites are
  *    allowlisted BY NAME below with the frame that makes them O(1).
  *  - exact `percentile` — its single merged buffer is O(distinct
  *    values) on one task; the repo policy is bounded-state grid
  *    histograms (HistQuantiles), so no plan may carry a percentile
  *    aggregate of either flavor.
  *
  * The targeted PlanSpec tests pin the *intended* shape of individual
  * operators (broadcast side, kernel presence, exchange counts); this
  * sweep is the safety net that a NEW catalog entry cannot quietly
  * reintroduce a banned pattern without tripping a red test.
  */
class CatalogPlanSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Streaming gates execute a real multi-batch stream inside the
    * builder and return a settled-parquet rollup — the returned plan is
    * a plain scan+agg with no operator content, and the execution cost
    * belongs in their own gates, not a plan screen. */
  private val streamingGates =
    Set("stream_merge_events", "stream_merge_partitioned", "stream_dedup_docs",
      "stream_hourly_rollup", "stream_join_views", "stock_stream_dim")

  /** J2 scalar-broadcast sites: each crossJoins a broadcast frame that
    * is O(1) rows by construction (the comment names the frame). A BNLJ
    * against a 1-row build side is a map-side append of constants, not
    * an O(n·m) join. */
  private val scalarBroadcast: Map[String, String] = Map(
    // -- 1-row grand-aggregate / model-stat frames (J2 pattern) --
    "q3_zscore_outliers" -> "1-row mean/stddev frame",
    "u2_activity_shocks" -> "1-row mean/stddev frame",
    "u4_result_summary" -> "1-row averages frame",
    "cusum_value_shift" -> "1-row running-sum max frame",
    "mi_flag_status" -> "1-row joint-total frame",
    "bigram_lift" -> "1-row token-total frame",
    "psi_value_drift" -> "1-row per-side totals frame",
    "psi_drift_total" -> "1-row per-side totals frame",
    "mix_temperature" -> "1-row stratum-weight-sum frame",
    "bootstrap_mean_ci" -> "1-row CI bounds frame",
    "vocab_coverage" -> "1-row vocab-size frame",
    "lm_surprisal" -> "1-row vocab/total count frames",
    "lsh_pair_recall" -> "two 1-row pair-count frames",
    "dup_inflation" -> "two 1-row census frames",
    "burstiness_topk" -> "1-row corpus doc-count frame",
    "source_mix_summary" -> "1-row corpus token-total frame",
    "lm_backoff" -> "1-row vocab/total count frames",
    "bm25_probe" -> "1-row corpus avgdl/N frame",
    "tfidf_topk" -> "1-row corpus-N frame",
    "hybrid_rrf" -> "1-row corpus stats frame (BM25 leg)",
    "feat_lang_profile" -> "1-row en-profile L2-norm frame",
    "kmv_distinct_events" -> "1-row KMV estimator frame",
    "kmv_user_overlap" -> "1-row per-sketch estimator frames",
    "kmv_rolling_users" -> "1-row exact-union gauge frame",
    "hll_distinct_events" -> "1-row register-rollup estimate frame",
    "cms_join_size" -> "d-row sketch-counter frames (d, w fixed)",
    "sample_priority" -> "tau frame: the (k+1)-th priority, <= 1 row",
    "heavy_hitter_tokens" -> "1-row corpus-total frame (threshold filter)",
    // -- O(buckets) histogram-cut frames (bounded by the fixed grid) --
    "deciles_orders" -> "O(cuts) grid-quantile frame",
    "mad_outliers" -> "1-row median + 1-row MAD grid-cut frames",
    "winsor_stats" -> "1-row [p01,p99] grid-cut frame",
    "cdf_events_value" -> "O(buckets) histogram lookup frame",
    "rolling_median_value" -> "1-row shared-grid stats frame",
    "daily_value_bands" -> "1-row shared-grid stats frame",
    "profile_events" -> "1-row grid-median frame per column",
    // -- bounded fixed query/sample side vs corpus: the exact/baseline
    //    compare is O(corpus * |fixed set|) BY DESIGN, |fixed set| const --
    "sim_topk" -> "fixed query set (brute-force baseline)",
    "sim_topk_ivf" -> "fixed query set (cell-probe search)",
    "sim_topk_q8" -> "fixed query set (quantized search)",
    "sim_topk_pq" -> "fixed 10-query frame (ADC scan over map-side recon)",
    "sim_topk_pq256" -> "fixed 10-query frame (ADC scan, production PQ8x256 codec)",
    "pq_recall" -> "fixed query set + exact-baseline + 1-row count frames",
    "pq256_recall" -> "fixed query set + exact-baseline + 1-row count frames",
    "ivfadc_recall" -> "fixed query set + exact-baseline + 1-row count frames",
    "ivfadc256_recall" -> "fixed query set + exact-baseline + 1-row count frames",
    "pq_recall_d256" -> "fixed query set + exact-baseline + 1-row count frames",
    "ivfadc_recall_d256" -> "fixed query set + exact-baseline + 1-row count frames",
    "ann_recall" -> "fixed query set + exact-baseline frames",
    "rp_distortion" -> "fixed 600-pair sample frame",
    // -- bounded-frame non-equi self-join: the corpus aggregates to an
    //    O(days) frame FIRST; the day<day pair join is span-bounded
    //    (a month is <= 31 rows -> <= 465 pairs) at any corpus SF --
    "trend_theil_sen" -> "O(days) daily-mean frame self-join (span-bounded pairs)",
    // -- TakeOrdered-bounded head: the corpus aggregates to word counts,
    //    a LIMIT 256 cut bounds the frame, THEN the rk<rk pair join and
    //    the 1-row median frames run on <= 256 rows at any corpus SF --
    "zipf_slope" -> "top-256 frequency head self-join + 1-row median frames",
    "keywords_per_source" -> "1-row source-count frame",
    // -- two 1-row exact-quantile frames crossJoined --
    "exact_quantiles_totalprice" -> "1-row exact-cut frames (p50, p90)",
    // -- fixed-rounds global exact forms: the constant-key state join
    //    folds `k = k` away, degenerating the broadcast hash join into
    //    a BNLJ whose build side is the ONE-GROUP state frame (O(1)
    //    rows by construction — the global form has exactly one key) --
    "weighted_median_price" -> "1-row constant-key weighted-cut state frame",
    // -- stock-fixture synthesis: customer x (10-row batch frame) x
    //    (2-row dup frame) — both broadcast sides are O(1) literal
    //    ranges by construction (StockCatalog.rawStock), the map-side
    //    replication a scrape history is; u2/u3 additionally carry the
    //    1-row global-stats frame (the q3 scalar-cross-join shape) --
    "stock_stg" -> "10-row batch + 2-row dup broadcast frames",
    "stock_dim_entity" -> "10-row batch + 2-row dup broadcast frames",
    "stock_dim_entity_scalable" -> "10-row batch + 2-row dup broadcast frames",
    "stock_fct_observations" -> "10-row batch + 2-row dup broadcast frames",
    "stock_q1_top_market_cap" -> "10-row batch + 2-row dup broadcast frames",
    "stock_q2_daily_trend" -> "10-row batch + 2-row dup broadcast frames",
    "stock_q3_volume_outliers" -> "fixture frames + 1-row volume-stats frame",
    "stock_q4_geo" -> "10-row batch + 2-row dup broadcast frames",
    "stock_q5_risk_watchlist" -> "10-row batch + 2-row dup broadcast frames",
    "stock_u1_filters" -> "10-row batch + 2-row dup broadcast frames",
    "stock_u2_shocks" -> "fixture frames + 1-row volume-stats frame",
    "stock_u3_kpis" -> "fixture frames (top-5 leg)",
    "stock_q4_geo_scalable" -> "fixture frames (sums + O(locations) HLL frame join)",
    "stock_raw_qa" -> "10-row batch + 2-row dup broadcast frames"
  )

  test("no cartesian product, no unbounded nested-loop join, no exact percentile — anywhere") {
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val entries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => streamingGates(name) }
    for ((name, fn) <- entries) {
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch {
          case e: Throwable =>
            violations += s"$name: query construction failed: ${e.getMessage}"
            ""
        }
      if (plan.contains("CartesianProduct"))
        violations += s"$name: CartesianProduct in plan"
      if (plan.contains("BroadcastNestedLoopJoin") && !scalarBroadcast.contains(name))
        violations += s"$name: BroadcastNestedLoopJoin without a documented O(1) build side"
      if (plan.toLowerCase.contains("percentile"))
        violations += s"$name: percentile aggregate (unbounded merge buffer)"
    }
    assert(violations.isEmpty,
      s"\n${violations.size} plan-hygiene violations:\n${violations.mkString("\n")}")
  }
}
