package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Cols

/** The reference's app-layer (serving) query surface — interactive
  * filter+top-k, one-sided z-score shock detection, KPI block, value
  * binning, JSON extraction, time rollups (SURVEY.md §2.8 U1–U4;
  * reference originals /root/reference/app/streamlit_app.py:156-430) —
  * re-targeted at the harness tables.
  */
object AppOps {

  /** U1 analogue — interactive filter + parameterized top-k
    * (ref app/streamlit_app.py:167-187). NULL-as-0 threshold semantics
    * (P9: metric.fillna(0) >= threshold). Equality filters + top-k
    * plan to scan-with-pushed-filter + TakeOrderedAndProject. */
  def u1FilterTopK(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .filter(col("o_orderstatus") === "O")
      .filter(coalesce(col("o_totalprice"), lit(0.0)) >= 100000.0)
      .select(
        col("o_orderkey"), col("o_custkey"), col("c_name"),
        Cols.r(col("o_totalprice"), 2).as("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  /** U2 analogue — liquidity shocks: one-sided z > 2 on a per-entity
    * activity metric (ref app/streamlit_app.py:190-203). The metric is
    * daily event count per user; global stats via 1-row aggregate +
    * broadcast cross join (integer sums ⇒ exact on any cluster). */
  def u2ActivityShocks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daily = ev.groupBy(
        col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.agg(
      (sum(col("n_events")).cast("double") / count(lit(1))).as("mean_n"),
      sqrt((sum(col("n_events") * col("n_events")).cast("double")
        - sum(col("n_events")).cast("double") * sum(col("n_events")).cast("double")
          / count(lit(1)))
        / (count(lit(1)) - lit(1.0))).as("std_n"))
    daily.crossJoin(broadcast(stats))
      .withColumn("z", Cols.r(Cols.zScore(col("n_events").cast("double"), col("mean_n"), col("std_n")), 4))
      .filter(col("z") > 2.0)
      .select(col("user_id"), col("day"), col("n_events"), col("z"))
      .orderBy(col("z").desc, col("user_id").asc, col("day").asc)
  }

  /** U3 analogue — KPI block: grand totals in one row
    * (ref app/streamlit_app.py:406-430: total volume, counts, top
    * symbol). Single partial-aggregable pass over the fact table. */
  def u3KpiSummary(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.agg(
      Cols.r(Cols.sumExact(coalesce(col("value"), lit(0.0)), 2), 2).as("total_value"),
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      Cols.r(max(col("value")), 2).as("max_value"),
      Cols.r(Cols.avgExact(col("value"), 2), 4).as("avg_value"))
  }

  /** F20 analogue — pandas-cut binning with right-closed bins
    * (ref app/streamlit_app.py:82-88), grouped rollup over the bin. */
  def f20BinsAcctbal(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val bin = when(col("c_acctbal").isNull, lit("Unknown"))
      .when(col("c_acctbal") <= 0.0, lit("Negative"))
      .when(col("c_acctbal") <= 5000.0, lit("Mid"))
      .otherwise(lit("High"))
    c.groupBy(bin.as("acctbal_bin"))
      .agg(
        count(lit(1)).as("n_customers"),
        Cols.r(Cols.sumExact(col("c_acctbal"), 2), 2).as("total_bal"))
      .orderBy(col("acctbal_bin").asc)
  }

  /** Harness-specific: JSON payload rollup — `props` is a JSON string
    * (FIXTURES.md §B); extraction via get_json_object (SURVEY §2.7
    * notes this as the `from_json` extension point). */
  def eJsonRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val k = get_json_object(col("props"), "$.k").cast("long")
    ev.select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        (sum(col("k")).cast("double") / count(col("k"))).as("raw_avg"))
      .withColumn("avg_k", Cols.r(col("raw_avg"), 4))
      .drop("raw_avg")
      .orderBy(col("event_type").asc)
  }

  /** U4 analogue — result summary: grand averages + first-row pick
    * formatted into a human-readable line
    * (ref app/streamlit_app.py:206-222 build_summary_text; F23
    * format strings). Numbers pass through DECIMAL casts so the
    * string form is engine-exact (decimal→string is deterministic in
    * both Spark and DuckDB; %-formatting of raw doubles is not). */
  def u4ResultSummary(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val top = ev.orderBy(col("value").desc_nulls_last, col("event_id").asc).limit(1)
      .select(col("event_id").as("top_event_id"))
    ev.agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Cols.r(Cols.avgExact(col("value"), 2), 4).as("avg_value"))
      .crossJoin(broadcast(top))
      .withColumn("summary", concat(
        lit("Analyzed "), col("n_events"),
        lit(" events from "), col("n_users"),
        lit(" users; avg value "),
        coalesce(col("avg_value").cast("decimal(18,4)").cast("string"), lit("")),
        lit("; top event "), col("top_event_id")))
      .select(col("n_events"), col("n_users"), col("avg_value"),
        col("top_event_id"), col("summary"))
  }

  /** Harness-specific: tumbling-hour rollup over event time — the
    * batch equivalent of the streaming windowed aggregation
    * (SURVEY §2.9; graft.streaming has the readStream form). */
  def eHourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        Cols.r(Cols.sumExact(col("value"), 2), 2).as("total_value"))
      .orderBy(col("hour").asc)
  }

  val oracles: Map[String, String] = Map(
    "u1_filter_topk" ->
      """SELECT o_orderkey, o_custkey, c_name,
        |       floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS o_totalprice,
        |       substr(CAST(o_orderdate AS VARCHAR(30)), 1, 10) AS order_date
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderstatus = 'O'
        |  AND coalesce(o_totalprice, 0) >= 100000
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "u2_activity_shocks" ->
      """WITH daily AS (
        |  SELECT user_id, substr(CAST(ts AS VARCHAR(30)), 1, 10) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1, 2
        |), stats AS (
        |  SELECT CAST(sum(n_events) AS DOUBLE) / count(*) AS mean_n,
        |         sqrt((CAST(sum(n_events * n_events) AS DOUBLE)
        |               - CAST(sum(n_events) AS DOUBLE) * CAST(sum(n_events) AS DOUBLE) / count(*))
        |              / (count(*) - 1.0)) AS std_n
        |  FROM daily
        |), z AS (
        |  SELECT user_id, day, n_events,
        |         floor(((CAST(n_events AS DOUBLE) - mean_n) / std_n) * 1e4 + 0.5) / 1e4 AS z
        |  FROM daily CROSS JOIN stats
        |)
        |SELECT user_id, day, n_events, z FROM z
        |WHERE z > 2.0
        |ORDER BY z DESC, user_id ASC, day ASC""".stripMargin,
    "u3_kpi_summary" ->
      """SELECT floor((CAST(sum(CAST(coalesce(value, 0) AS DECIMAL(30,2))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total_value,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users,
        |       floor((max(value)) * 1e2 + 0.5) / 1e2 AS max_value,
        |       floor((CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / count(value)) * 1e4 + 0.5) / 1e4 AS avg_value
        |FROM events""".stripMargin,
    "f20_bins_acctbal" ->
      """SELECT CASE WHEN c_acctbal IS NULL THEN 'Unknown'
        |            WHEN c_acctbal <= 0 THEN 'Negative'
        |            WHEN c_acctbal <= 5000 THEN 'Mid'
        |            ELSE 'High' END AS acctbal_bin,
        |       count(*) AS n_customers,
        |       floor((CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total_bal
        |FROM customer
        |GROUP BY 1
        |ORDER BY acctbal_bin ASC""".stripMargin,
    "e_json_rollup" ->
      """SELECT event_type,
        |       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |       floor((CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
        |              / count(CAST(json_extract_string(props, '$.k') AS BIGINT))) * 1e4 + 0.5) / 1e4 AS avg_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin,
    "u4_result_summary" ->
      """WITH agg AS (
        |  SELECT count(*) AS n_events,
        |         count(DISTINCT user_id) AS n_users,
        |         floor((CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / count(value)) * 1e4 + 0.5) / 1e4 AS avg_value
        |  FROM events
        |), top AS (
        |  SELECT event_id AS top_event_id FROM events
        |  ORDER BY value DESC NULLS LAST, event_id ASC LIMIT 1
        |)
        |SELECT n_events, n_users, avg_value, top_event_id,
        |       concat('Analyzed ', n_events, ' events from ', n_users,
        |              ' users; avg value ', CAST(CAST(avg_value AS DECIMAL(18,4)) AS VARCHAR(64)),
        |              '; top event ', top_event_id) AS summary
        |FROM agg CROSS JOIN top""".stripMargin,
    "e_hourly_rollup" ->
      """SELECT substr(CAST(ts AS VARCHAR(30)), 1, 13) || ':00' AS hour,
        |       count(*) AS n_events,
        |       floor((CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total_value
        |FROM events
        |GROUP BY 1
        |ORDER BY hour ASC""".stripMargin
  )

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u1_filter_topk"     -> (u1FilterTopK _),
    "u2_activity_shocks" -> (u2ActivityShocks _),
    "u3_kpi_summary"     -> (u3KpiSummary _),
    "u4_result_summary"  -> (u4ResultSummary _),
    "f20_bins_acctbal"   -> (f20BinsAcctbal _),
    "e_json_rollup"      -> (eJsonRollup _),
    "e_hourly_rollup"    -> (eHourlyRollup _)
  )
}
