package graft

/** The SQL front-end contract: the ANSI subset of the oracle catalog
  * runs VERBATIM through `spark.sql` on the registered views and
  * produces the identical result the DataFrame API query produces.
  * Combined with the driver's DuckDB gate (which executes the same
  * text), these queries are proven to run unmodified on both engines
  * — the drop-in property a reference user migrating SQL cares about. */
class SqlFrontEndSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Oracle entries restricted to the ANSI dialect both engines parse
    * (no strftime / list literals & functions / DuckDB-only routine
    * names) — every catalog oracle verified to both PARSE and produce
    * DataFrame-identical results through spark.sql. Includes the
    * bounded-state histogram quantiles (mad_outliers, profile_events),
    * the layout queries (zorder_cells/read), and the streaming-gate
    * rollup. */
  private val ansiPortable = Seq(
    "a5_dup_audit", "agg_rollup_totals", "bloom_join_urgent",
    "cube_flag_status", "event_transitions", "f20_bins_acctbal",
    "funnel_stages", "grid_median_events", "kpi_unpivot", "mad_outliers",
    "mad_outliers_by_type", "mix_temperature", "sample_priority",
    "profile_events", "q1_top_brands", "q3_zscore_outliers", "recon_orders_events",
    "q4_geo_rollup", "q5_risk_watchlist", "sample_per_lang",
    "sample_priority_lang",
    "sample_strata", "stream_merge_events", "u3_kpi_summary", "cusum_value_shift",
    "corr_price_qty", "benford_totalprice", "ttest_value_halves",
    "u4_result_summary", "zorder_cells", "zorder_read", "fuzzy_pairs_customers",
    "anti_lapsed_custs", "window_rank_family", "split_train_val_test",
    "topk_value_by_type", "weighted_median_price", "weighted_median_by_flag")

  test("ANSI oracle SQL runs verbatim via spark.sql with DataFrame-identical results") {
    Views.register(spark, dir)
    ansiPortable.foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name)).toJSON.collect().toSeq
      val viaApi = SparkEntry.queries(name)(spark, dir).toJSON.collect().toSeq
      assert(viaSql == viaApi, s"$name: SQL text and DataFrame API disagree")
      assert(viaSql.nonEmpty, name)
    }
  }

  test("native kernels are callable from SQL strings on the views") {
    Views.register(spark, dir)
    val sq = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS sq FROM embeddings ORDER BY vec_id ASC LIMIT 5")
      .collect()
    assert(sq.length == 5 && sq.forall(_.getDouble(1) > 0))
    val th = spark.sql(
      "SELECT doc_id, size(graft_token_hashes(split(text, ' '))) AS n FROM documents ORDER BY doc_id ASC LIMIT 3")
      .collect()
    assert(th.length == 3 && th.forall(_.getInt(1) > 0))
  }

  test("views cover every harness table and re-registration is idempotent") {
    Views.register(spark, dir)
    Views.register(spark, dir)
    Views.tableNames.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").collect().length == 1, n)
    }
  }
}
