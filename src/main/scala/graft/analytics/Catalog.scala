package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Cols

/** The reference's analytics query surface (SURVEY.md §2.8, Q1–Q5)
  * re-targeted at the harness star schema: lineitem/orders play the
  * fact role, part/customer/nation/region the dims
  * (reference originals: /root/reference/sql/03_analytics_queries.sql).
  *
  * Scale posture (100 TB): every query below is fact-side streaming —
  * dims are explicitly `broadcast(...)` (they stay dim-sized at any SF
  * because facts grow and dims don't), aggregates get partial map-side
  * combine for free, global stats are computed as a 1-row aggregate
  * then cross-joined/broadcast (never a `Window.partitionBy()` global
  * window, which would single-partition the fact table), and every
  * top-k is `orderBy(...).limit(k)`, which Spark plans as
  * TakeOrderedAndProject (per-partition heaps, no global sort).
  *
  * Determinism for the DuckDB-oracle hash gate: each query ends in a
  * total ORDER BY and float aggregates are rounded.
  */
object Queries {

  /** Q1 analogue — top-10 by aggregated metric
    * (ref sql/03_analytics_queries.sql:6-22: fact⋈dim, GROUP BY dim
    * attrs, MAX(metric), ORDER BY DESC LIMIT 10). */
  def q1TopBrands(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        Cols.r(max(col("l_extendedprice")), 2).as("max_price"),
        Cols.r(Cols.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("p_brand").asc)
      .limit(10)
  }

  /** Q2 analogue — daily trend: per-date AVG/AVG/COUNT(DISTINCT)
    * (ref sql/03_analytics_queries.sql:24-32). Exact distinct, as in
    * the reference; Catalyst plans partial+final with distinct expand. */
  def q2DailyTrend(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      .agg(
        Cols.r(Cols.avgExact(col("l_extendedprice"), 2), 4).as("avg_price"),
        Cols.r(avg(col("l_quantity")), 4).as("avg_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("ship_date").asc)
  }

  /** Q3 analogue — global z-score outliers
    * (ref sql/03_analytics_queries.sql:34-65: grand-aggregate stats
    * CTE, CROSS JOIN onto facts, |z| >= threshold, ORDER BY |z| DESC).
    * The 1-row stats side goes through BroadcastNestedLoopJoin — the
    * scalable form of the reference's scalar cross join; the fact side
    * never shuffles. */
  def q3ZScoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_extendedprice").isNotNull)
    val stats = li.agg(
      Cols.avgExact(col("l_extendedprice"), 2).as("mean_price"),
      Cols.stddevExact(col("l_extendedprice"), 2).as("std_price"))
    li.crossJoin(broadcast(stats))
      .withColumn("price_z",
        Cols.r(Cols.zScore(col("l_extendedprice"), col("mean_price"), col("std_price")), 4))
      .filter(abs(col("price_z")) >= 1.5)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("price_z"))
      .orderBy(abs(col("price_z")).desc, col("l_orderkey").asc, col("l_linenumber").asc)
  }

  /** Q4 analogue — geographic rollup
    * (ref sql/03_analytics_queries.sql:67-78: COUNT DISTINCT, AVGs,
    * SUM grouped on a COALESCE'd geo attribute). Star join through
    * two broadcast dims; only the aggregate shuffles (32 partitions). */
  def q4GeoRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name").as("region_name"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        Cols.r(Cols.avgExact(col("o_totalprice"), 2), 4).as("avg_order_value"),
        Cols.r(Cols.sumExact(col("o_totalprice"), 2), 2).as("total_value"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_value").desc, col("region_name").asc)
  }

  /** Multi-level aggregate — ROLLUP (region, nation): per-nation rows,
    * per-region subtotals, and a grand total in ONE pass (Spark plans
    * an Expand + single hash aggregate — no self-union of three
    * scans, which is what makes rollups cheap at 100 TB). Total rows
    * are labeled 'ALL' via coalesce (TPC-H names are never NULL, so
    * no conflation), keeping the ORDER BY engine-neutral. */
  def aggRollupTotals(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        Cols.r(Cols.sumExact(col("c_acctbal"), 2), 2).as("total_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"), col("total_bal"))
      .orderBy(col("region_name").asc, col("nation_name").asc)
  }

  /** UNPIVOT — the KPI block as (kpi, value) rows: wide→long melt of a
    * 1-row aggregate, the shape UI metric panels and metric stores
    * consume. Spark's native unpivot (an Expand node, map-side only). */
  def kpiUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.agg(
        Cols.r(Cols.sumExact(coalesce(col("value"), lit(0.0)), 2), 2).as("total_value"),
        count(lit(1)).cast("double").as("n_events"),
        countDistinct(col("user_id")).cast("double").as("n_users"))
      .unpivot(Array.empty, Array(col("total_value"), col("n_events"), col("n_users")),
        "kpi", "value")
      .orderBy(col("kpi").asc)
  }

  /** Q5 analogue — windowed risk watchlist
    * (ref sql/03_analytics_queries.sql:80-148: per-entity trailing
    * 7-row moving average + LAG(7), guarded ratios, conjunctive
    * threshold filter, multi-key top-50). Window partitions by
    * supplier — high-cardinality at scale, so WindowExec's
    * sort-within-partition parallelizes; no global window anywhere. */
  def q5RiskWatchlist(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    li.withColumn("qty_7_avg", avg(col("l_quantity")).over(w.rowsBetween(-6, Window.currentRow)))
      .withColumn("price_7_ago", lag(col("l_extendedprice"), 7).over(w))
      .withColumn("spike_ratio", Cols.guardedRatio(col("l_quantity"), col("qty_7_avg")))
      .withColumn("momentum", Cols.guardedRatio(
        col("l_extendedprice") - col("price_7_ago"), col("price_7_ago")))
      .filter(col("spike_ratio") >= 1.5 && col("momentum") <= 0)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        Cols.r(col("spike_ratio"), 4).as("spike_ratio"),
        Cols.r(col("momentum"), 4).as("momentum"))
      .orderBy(col("spike_ratio").desc, col("momentum").asc,
        col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(50)
  }

  /** Anti-join churn audit (the TPC-H Q22 shape): customers with no
    * order since the cutoff, rolled up per nation — closes the
    * join-type surface (inner, outer, semi, ANTI) in the oracle
    * catalog. The date filter pushes into the orders scan BEFORE the
    * anti join, so the build side is the pruned recent-key set, not
    * the fact table. */
  def antiLapsedCusts(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-07-01").cast("date"))
      .select(col("o_custkey"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nation"))
      .agg(count(lit(1)).as("n_custs"),
        Cols.r(Cols.sumExact(col("c_acctbal"), 2), 2).as("total_bal"))
      .orderBy(col("nation").asc)
  }

  /** The rank-window family on one partition spec: rank, dense_rank,
    * percent_rank, cume_dist, ntile(4) over order value within nation
    * — every score is a ratio of integers (rank positions and
    * partition counts), so the doubles are bit-identical across
    * engines with no rounding ladder. */
  def windowRankFamily(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("pct_rank", Cols.r(percent_rank().over(w), 6))
      .withColumn("cume", Cols.r(cume_dist().over(w), 6))
      .withColumn("quartile", ntile(4).over(w))
      .filter(col("rnk") <= 5)
      .select(col("c_nationkey").as("nation"), col("o_orderkey"),
        Cols.r(col("o_totalprice"), 2).as("o_totalprice"),
        col("rnk").cast("long").as("rnk"), col("drnk").cast("long").as("drnk"),
        col("pct_rank"), col("cume"), col("quartile").cast("long").as("quartile"))
      .orderBy(col("nation").asc, col("rnk").asc, col("o_orderkey").asc)
  }

  /** PIVOT: daily event counts spread to one column per event type
    * (explicit value list, so the output schema is static and the
    * oracle mirrors it with conditional aggregation — the engine-
    * portable form of PIVOT). */
  def pivotDailyTypes(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("event_date"), col("event_type"))
      .groupBy(col("event_date"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("event_date").asc)
  }

  /** DuckDB oracle SQL for the queries above. Column aliases match the
    * Spark side exactly (driver sorts columns by name before hashing). */
  val oracles: Map[String, String] = Map(
    "q1_top_brands" ->
      """SELECT p_brand,
        |       floor((max(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS max_price,
        |       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY revenue DESC, p_brand ASC
        |LIMIT 10""".stripMargin,
    "q2_daily_trend" ->
      """SELECT substr(CAST(l_shipdate AS VARCHAR(30)), 1, 10) AS ship_date,
        |       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS avg_price,
        |       floor((avg(l_quantity)) * 1e4 + 0.5) / 1e4 AS avg_qty,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY ship_date ASC""".stripMargin,
    "q3_zscore_outliers" ->
      """WITH stats AS (
        |  SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(l_extendedprice) AS mean_price,
        |         sqrt((CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
        |               - CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
        |                 * CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(l_extendedprice))
        |              / (count(l_extendedprice) - 1.0)) AS std_price
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |), z AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |         floor(((l_extendedprice - mean_price) / std_price) * 1e4 + 0.5) / 1e4 AS price_z
        |  FROM lineitem CROSS JOIN stats
        |  WHERE l_extendedprice IS NOT NULL
        |)
        |SELECT * FROM z
        |WHERE abs(price_z) >= 1.5
        |ORDER BY abs(price_z) DESC, l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "q4_geo_rollup" ->
      """SELECT r_name AS region_name,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) / count(o_totalprice)) * 1e4 + 0.5) / 1e4 AS avg_order_value,
        |       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total_value,
        |       count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY total_value DESC, region_name ASC""".stripMargin,
    "q5_risk_watchlist" ->
      """WITH win AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |         avg(l_quantity) OVER (PARTITION BY l_suppkey
        |           ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS qty_7_avg,
        |         lag(l_extendedprice, 7) OVER (PARTITION BY l_suppkey
        |           ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC) AS price_7_ago
        |  FROM lineitem
        |), scored AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |         CASE WHEN qty_7_avg IS NULL OR qty_7_avg = 0 THEN NULL
        |              ELSE l_quantity / qty_7_avg END AS spike_ratio,
        |         CASE WHEN price_7_ago IS NULL OR price_7_ago = 0 THEN NULL
        |              ELSE (l_extendedprice - price_7_ago) / price_7_ago END AS momentum
        |  FROM win
        |)
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |       floor((spike_ratio) * 1e4 + 0.5) / 1e4 AS spike_ratio,
        |       floor((momentum) * 1e4 + 0.5) / 1e4 AS momentum
        |FROM scored
        |WHERE spike_ratio >= 1.5 AND momentum <= 0
        |ORDER BY spike_ratio DESC, momentum ASC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 50""".stripMargin,
    "anti_lapsed_custs" ->
      """SELECT c_nationkey AS nation, count(*) AS n_custs,
        |       floor((CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2000-07-01')
        |GROUP BY 1
        |ORDER BY nation ASC""".stripMargin,
    "window_rank_family" ->
      """WITH j AS (
        |  SELECT c_nationkey AS nation, o_orderkey, o_totalprice,
        |         rank() OVER w AS rnk,
        |         dense_rank() OVER w AS drnk,
        |         percent_rank() OVER w AS praw,
        |         cume_dist() OVER w AS craw,
        |         ntile(4) OVER w AS quartile
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |)
        |SELECT nation, o_orderkey,
        |       floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS o_totalprice,
        |       CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk,
        |       floor(praw * 1e6 + 0.5) / 1e6 AS pct_rank,
        |       floor(craw * 1e6 + 0.5) / 1e6 AS cume,
        |       CAST(quartile AS BIGINT) AS quartile
        |FROM j WHERE rnk <= 5
        |ORDER BY nation ASC, rnk ASC, o_orderkey ASC""".stripMargin,
    "pivot_daily_types" ->
      """SELECT substr(CAST(ts AS VARCHAR(30)), 1, 10) AS event_date,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1
        |ORDER BY event_date ASC""".stripMargin,
    "agg_rollup_totals" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |       coalesce(n_name, 'ALL') AS nation_name,
        |       count(*) AS n_customers,
        |       floor((CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region_name ASC, nation_name ASC""".stripMargin,
    "kpi_unpivot" ->
      """WITH agg AS (
        |  SELECT floor((CAST(sum(CAST(coalesce(value, 0) AS DECIMAL(30,2))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total_value,
        |         CAST(count(*) AS DOUBLE) AS n_events,
        |         CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users
        |  FROM events
        |)
        |SELECT 'n_events' AS kpi, n_events AS value FROM agg
        |UNION ALL SELECT 'n_users', n_users FROM agg
        |UNION ALL SELECT 'total_value', total_value FROM agg
        |ORDER BY kpi ASC""".stripMargin
  )

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_top_brands"      -> (q1TopBrands _),
    "q2_daily_trend"     -> (q2DailyTrend _),
    "q3_zscore_outliers" -> (q3ZScoreOutliers _),
    "q4_geo_rollup"      -> (q4GeoRollup _),
    "q5_risk_watchlist"  -> (q5RiskWatchlist _),
    "agg_rollup_totals"  -> (aggRollupTotals _),
    "kpi_unpivot"        -> (kpiUnpivot _),
    "anti_lapsed_custs"  -> (antiLapsedCusts _),
    "window_rank_family" -> (windowRankFamily _),
    "pivot_daily_types"  -> (pivotDailyTypes _)
  )
}
