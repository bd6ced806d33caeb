package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-domain catalogs:
  *  - [[graft.analytics.Queries]]  — reference Q1–Q5 analytics surface
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Queries.q1TopBrands(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Queries.entries ++
      analytics.PipelineOps.entries ++
      analytics.AppOps.entries ++
      analytics.DataOps.entries ++
      analytics.CorpusOps.entries ++
      analytics.CartographyOps.entries ++
      analytics.TokenizerOps.entries ++
      analytics.SpectrumOps.entries ++
      analytics.StatsOps.entries ++
      pipeline.StockCatalog.entries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    analytics.Queries.oracles ++
      analytics.PipelineOps.oracles ++
      analytics.AppOps.oracles ++
      analytics.DataOps.oracles ++
      analytics.CorpusOps.oracles ++
      analytics.CartographyOps.oracles ++
      analytics.TokenizerOps.oracles ++
      analytics.SpectrumOps.oracles ++
      analytics.StatsOps.oracles ++
      pipeline.StockCatalog.oracles
}
