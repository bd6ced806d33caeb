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
    * can call `graft_dot`, `graft_token_hashes`, … directly. */
  def register(spark: SparkSession, dir: String): Unit = {
    GraftFunctions.register(spark)
    tableNames.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables.t(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
  }
}
