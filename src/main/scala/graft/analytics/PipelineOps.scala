package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Cols
import graft.sources.LayerWriter

/** The reference's load/transform (ELT) surface re-targeted at the
  * harness `events` table: staging projection with content-hash
  * surrogate keys, window dedupe, keep-latest dimension build, and
  * MERGE-style upsert (SURVEY.md §2.8 L1/L2/M1/M2; reference originals
  * /root/reference/sql/02_load_data.sql:78-165 and the dbt models in
  * /root/reference/dbt_project/models/).
  *
  * Scale notes: all window dedupes partition by high-cardinality keys
  * (user_id), so WindowExec parallelizes; the upsert is an anti-join +
  * union (no full-table rewrite of unmatched rows' content); hash keys
  * are pure per-row expressions (codegen'd, no shuffle).
  */
object PipelineOps {

  // Timestamps render through CAST-to-string: both engines trim
  // trailing fractional zeros identically ('…03.45', '…03', '…03.456789'),
  // so the same text is VERBATIM-portable (strftime's %f is DuckDB-only
  // and date_format is Spark-only — SqlFrontEndSpec).

  /** M1 analogue — staging model: typed projection, JSON payload
    * extraction, sha256 surrogate keys over '|'-joined natural keys
    * (ref dbt stg_most_actives.sql:29-47), then window-dedupe keeping
    * the latest row per (user, type, day)
    * (ref sql/02_load_data.sql:109-112, QUALIFY rewritten as
    * rank-column + filter since OSS Spark has no QUALIFY). */
  def m1StgEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("event_date"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.select(
        col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        Cols.hashKey(col("user_id")).as("entity_sk"),
        Cols.hashKey(col("user_id"), col("event_id")).as("observation_sk"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_type"), col("event_date"), col("event_id"),
        col("entity_sk"), col("observation_sk"), col("k"),
        Cols.r(col("value"), 4).as("value"))
      .orderBy(col("user_id").asc, col("event_type").asc, col("event_date").asc)
  }

  /** M2 analogue — keep-latest dimension: one row per user with their
    * most recent event (ref dim_entity.sql:15-31). Explicit
    * desc_nulls_last + event_id tiebreak: Snowflake bare DESC is
    * NULLS FIRST, Spark is NULLS LAST — SURVEY §2.5 W2 standardizes
    * on nulls-last. */
  def m2DimUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc_nulls_last, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_type").as("last_event_type"),
        col("ts").cast("string").as("last_seen_ts"),
        Cols.r(col("value"), 4).as("last_value"))
      .orderBy(col("user_id").asc)
  }

  /** J3 analogue — MERGE upsert without a table format
    * (ref sql/02_load_data.sql:78-165): target = latest state per user
    * before the cutoff; source = latest per user from the new batch;
    * matched keys take the source row, unmatched target rows survive.
    * Spark form: target ANTI JOIN source ∪ source — the 100 TB-safe
    * MERGE emulation (only keys shuffle; re-running is idempotent). */
  def j3UpsertUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    def latestPerUser(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc_nulls_last, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }
    val target = latestPerUser(ev.filter(col("ts") < cutoff))
      .withColumn("batch", lit("old"))
    val source = latestPerUser(ev.filter(col("ts") >= cutoff))
      .withColumn("batch", lit("new"))
    target.join(source, Seq("user_id"), "left_anti")
      .unionByName(source)
      .select(
        col("user_id"), col("batch"),
        col("ts").cast("string").as("ts_str"),
        Cols.r(col("value"), 4).as("value"))
      .orderBy(col("user_id").asc)
  }

  /** A6/A7 analogue — load-QA conditional counts per group
    * (ref sql/02_load_data.sql:66-73: COUNT(*) + COUNT_IF over
    * blank/unparseable fields). Pure partial-aggregable counts. */
  def qaCountsEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1).otherwise(0)).as("n_null_value"),
        sum(when(get_json_object(col("props"), "$.k").cast("long") > 50, 1).otherwise(0))
          .as("n_k_gt_50"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type").asc)
  }

  /** Cohort retention — the first-seen-cohort × day-offset activity
    * matrix every product-analytics stack runs: users grouped by the
    * date of their first event, distinct-user counts for each later
    * active day offset (0..14). Shape: one rollup for first-seen (a
    * per-user min — partial-aggregable), one distinct-activity frame,
    * one join on user_id (first-seen side is users-not-events sized;
    * AQE broadcasts when it measures small), then a two-key count
    * distinct. Dates leave as strings (engine-portable compare). */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
    ev.distinct()
      .join(first, Seq("user_id"))
      .withColumn("day_offset", datediff(col("d"), col("cohort_d")).cast("long"))
      .filter(col("day_offset") <= 14)
      .groupBy(col("cohort_d"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_users"))
      .orderBy(col("cohort_day").asc, col("day_offset").asc)
  }

  /** Cross-system reconciliation audit — the FULL OUTER join surface:
    * per-user order activity vs event activity, categorized by
    * presence (both / orders_only / events_only). Both sides
    * pre-aggregate BEFORE the outer join, so the shuffle carries one
    * row per user, not raw facts, and the join reuses the rollups'
    * hash partitioning (no extra exchange). All output measures are
    * integer sums — order-independent by construction. */
  def reconOrdersEvents(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val e = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("user_id"), "full_outer")
      .withColumn("presence",
        when(col("n_orders").isNotNull && col("n_events").isNotNull, "both")
          .when(col("n_orders").isNotNull, "orders_only")
          .otherwise("events_only"))
      .groupBy(col("presence"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("n_orders"), lit(0L))).as("n_orders"),
        sum(coalesce(col("n_events"), lit(0L))).as("n_events"))
      .orderBy(col("presence").asc)
  }

  /** A5 analogue — duplicate-key audit: GROUP BY key HAVING COUNT>1
    * (ref sql/02_load_data.sql:170-175). */
  def a5DupAudit(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_dup"))
      .filter(col("n_dup") > 1)
      .orderBy(col("n_dup").desc, col("l_orderkey").asc)
      .limit(500)
  }

  /** Deterministic per-sf, per-process scratch location for the
    * partitioned fact copy (tmpdir — never inside the read-only
    * testdata). The PID component keeps concurrent JVMs (e.g. a test
    * run racing a Verify sweep) from overwrite-vs-read races on the
    * same directory; floorMod avoids math.abs(Int.MinValue). */
  def factEventsPath(dir: String): String = {
    val pid = ProcessHandle.current().pid()
    s"${System.getProperty("java.io.tmpdir")}/graft_fact_events_${pid}_${math.floorMod(dir.hashCode, 1 << 30)}"
  }

  /** S13 end-to-end — the load-bearing scale decision exercised under
    * the oracle gate: events land date-partitioned via
    * [[LayerWriter.writeFact]], the read-back rollup filters one week,
    * and Catalyst prunes to the touched partitions at PLAN time
    * (`PartitionFilters` on the scan — asserted in PlanSpec; at 100 TB
    * this is the difference between scanning 7 days and scanning
    * years). The oracle computes the same week from the raw table, so
    * the gate also proves the partitioned round-trip loses nothing. */
  def s13FactPrune(spark: SparkSession, dir: String): DataFrame = {
    val fact = factEventsPath(dir)
    LayerWriter.writeFact(
      Tables.events(spark, dir)
        .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd")),
      fact, "event_date")
    spark.read.parquet(fact)
      .filter(col("event_date").between("2024-01-10", "2024-01-16"))
      .groupBy(date_format(col("event_date"), "yyyy-MM-dd").as("event_date"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Cols.r(Cols.sumExact(col("value"), 2), 2).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_date").asc, col("event_type").asc)
  }

  val oracles: Map[String, String] = Map(
    "s13_fact_prune" ->
      """SELECT substr(CAST(ts AS VARCHAR(30)), 1, 10) AS event_date, event_type,
        |       count(*) AS n_events,
        |       floor((CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS total_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE substr(CAST(ts AS VARCHAR(30)), 1, 10) BETWEEN '2024-01-10' AND '2024-01-16'
        |GROUP BY 1, 2
        |ORDER BY event_date ASC, event_type ASC""".stripMargin,
    "m1_stg_events" ->
      """WITH stg AS (
        |  SELECT event_id, user_id, event_type,
        |         substr(CAST(ts AS VARCHAR(30)), 1, 10) AS event_date,
        |         sha256(CAST(user_id AS VARCHAR(30))) AS entity_sk,
        |         sha256(concat_ws('|', CAST(user_id AS VARCHAR(30)), CAST(event_id AS VARCHAR(30)))) AS observation_sk,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |         floor((value) * 1e4 + 0.5) / 1e4 AS value,
        |         row_number() OVER (PARTITION BY user_id, event_type, substr(CAST(ts AS VARCHAR(30)), 1, 10)
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, event_type, event_date, event_id, entity_sk, observation_sk, k, value
        |FROM stg WHERE rn = 1
        |ORDER BY user_id ASC, event_type ASC, event_date ASC""".stripMargin,
    "m2_dim_users" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, ts, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC NULLS LAST, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, event_type AS last_event_type,
        |       CAST(ts AS VARCHAR(30)) AS last_seen_ts,
        |       floor((value) * 1e4 + 0.5) / 1e4 AS last_value
        |FROM ranked WHERE rn = 1
        |ORDER BY user_id ASC""".stripMargin,
    "j3_upsert_users" ->
      """WITH tgt AS (
        |  SELECT user_id, ts, value, 'old' AS batch,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC) AS rn
        |  FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        |), src AS (
        |  SELECT user_id, ts, value, 'new' AS batch,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC) AS rn
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |), merged AS (
        |  SELECT * FROM tgt WHERE rn = 1
        |    AND user_id NOT IN (SELECT user_id FROM src WHERE rn = 1)
        |  UNION ALL
        |  SELECT * FROM src WHERE rn = 1
        |)
        |SELECT user_id, batch,
        |       CAST(ts AS VARCHAR(30)) AS ts_str,
        |       floor((value) * 1e4 + 0.5) / 1e4 AS value
        |FROM merged
        |ORDER BY user_id ASC""".stripMargin,
    "qa_counts_events" ->
      """SELECT event_type,
        |       count(*) AS n_rows,
        |       count(*) FILTER (WHERE value IS NULL) AS n_null_value,
        |       count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS n_k_gt_50,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin,
    "a5_dup_audit" ->
      """SELECT l_orderkey, count(*) AS n_dup
        |FROM lineitem
        |GROUP BY l_orderkey
        |HAVING count(*) > 1
        |ORDER BY n_dup DESC, l_orderkey ASC
        |LIMIT 500""".stripMargin,
    "cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), act AS (
        |  SELECT DISTINCT user_id, d FROM ev
        |), fst AS (
        |  SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY 1
        |)
        |SELECT substr(CAST(cohort_d AS VARCHAR(30)), 1, 10) AS cohort_day,
        |       CAST(floor((epoch_us(CAST(d AS TIMESTAMP)) - epoch_us(CAST(cohort_d AS TIMESTAMP))) / 86400000000.0) AS BIGINT) AS day_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN fst f USING (user_id)
        |WHERE epoch_us(CAST(d AS TIMESTAMP)) - epoch_us(CAST(cohort_d AS TIMESTAMP)) <= 14 * 86400000000
        |GROUP BY 1, 2
        |ORDER BY cohort_day ASC, day_offset ASC""".stripMargin,
    "recon_orders_events" ->
      """WITH o AS (
        |  SELECT o_custkey AS user_id, count(*) AS n_orders
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
        |), e AS (
        |  SELECT user_id, count(*) AS n_events
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |)
        |SELECT CASE WHEN o.user_id IS NOT NULL AND e.user_id IS NOT NULL THEN 'both'
        |            WHEN o.user_id IS NOT NULL THEN 'orders_only'
        |            ELSE 'events_only' END AS presence,
        |       count(*) AS n_users,
        |       CAST(sum(coalesce(o.n_orders, 0)) AS BIGINT) AS n_orders,
        |       CAST(sum(coalesce(e.n_events, 0)) AS BIGINT) AS n_events
        |FROM o FULL OUTER JOIN e ON o.user_id = e.user_id
        |GROUP BY 1
        |ORDER BY presence ASC""".stripMargin
  )

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_stg_events"    -> (m1StgEvents _),
    "m2_dim_users"     -> (m2DimUsers _),
    "j3_upsert_users"  -> (j3UpsertUsers _),
    "qa_counts_events" -> (qaCountsEvents _),
    "a5_dup_audit"     -> (a5DupAudit _),
    "recon_orders_events" -> (reconOrdersEvents _),
    "cohort_retention" -> (cohortRetention _),
    "s13_fact_prune"   -> (s13FactPrune _)
  )
}
