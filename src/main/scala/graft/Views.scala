package graft

import org.apache.spark.sql.SparkSession

/** SQL string front-end: registers every harness table as a
  * session-scoped temp view (and the graft native functions), so a
  * reference user can port their SQL verbatim —
  * `spark.sql("SELECT ... FROM lineitem JOIN part ...")` — instead of
  * rewriting queries against the DataFrame API. No catalog mutation,
  * no Hive dependency; at warehouse scale these would be catalog
  * tables and the same SQL would run unchanged.
  *
  * The ANSI subset of the oracle catalog is proven to run verbatim
  * through this front-end with results identical to the DataFrame API
  * queries (SqlFrontEndSpec) — the same SQL text executes on Spark
  * and DuckDB with hash-equal output.
  */
object Views {

  /** All harness tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table under its harness name, with the same
    * loader semantics as [[Tables]] (events gets the ns→µs timestamp
    * normalization), plus the native function registry so SQL strings
    * can call `graft_dot`, `graft_token_hashes`, … directly, plus the
    * DuckDB-compat pack below. */
  def register(spark: SparkSession, dir: String): Unit = {
    GraftFunctions.register(spark)
    registerCompat(spark)
    tableNames.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables.t(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
  }

  /** DuckDB-compat function pack — the migration shim that lets more
    * of the shared-dialect catalog run VERBATIM on both engines. Each
    * is a declarative SQL function (Spark 4 `CREATE FUNCTION … RETURN
    * expr`): the analyzer INLINES the body into the plan, so these
    * stay whole-stage-codegen expressions — no interpreted UDF enters
    * any hot path (the §2.10 policy). Only spelling differences are
    * bridged, never semantics: each body is the Spark-native function
    * with the identical contract to DuckDB's name. */
  def registerCompat(spark: SparkSession): Unit = {
    // DuckDB sha256(VARCHAR) → lowercase hex; Spark spells it sha2(x, 256)
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION sha256(x STRING) " +
      "RETURNS STRING RETURN sha2(x, 256)")
    // DuckDB epoch_us(TIMESTAMP) → microseconds since epoch
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(t TIMESTAMP) " +
      "RETURNS BIGINT RETURN unix_micros(t)")
    // DuckDB json_extract_string(json, path) ≡ Spark get_json_object
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION json_extract_string(j STRING, p STRING) " +
      "RETURNS STRING RETURN get_json_object(j, p)")
  }
}
