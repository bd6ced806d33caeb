package graft.sources

import org.apache.spark.sql.DataFrame

/** Persistence layer for the medallion tables (SURVEY.md §2.1 S13,
  * §7.5 scale posture).
  *
  * Fact-like tables are written partitioned by their date column —
  * this is THE load-bearing scale decision: at 100 TB, every Q2/Q5
  * style date-ranged query prunes to the touched partitions at plan
  * time (PartitionFilters in the scan, verified in PlanSpec), and
  * incremental loads append new date partitions without rewriting
  * history. Dimension tables stay unpartitioned single-digit-file
  * directories so Catalyst auto-broadcasts them.
  */
object LayerWriter {

  /** Write a fact table partitioned by `dateCol` (hive-style layout →
    * partition pruning on read). `maxRecordsPerFile` bounds file size
    * so a skewed date cannot produce one giant file. `format`:
    * parquet (default) or orc — both columnar with pushdown/pruning;
    * csv/json for interchange exports. */
  def writeFact(df: DataFrame, path: String, dateCol: String,
      maxRecordsPerFile: Long = 5000000L, format: String = "parquet"): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(dateCol)
      .format(format)
      .save(path)

  /** Write a dimension table compacted to few files (broadcast-friendly). */
  def writeDim(df: DataFrame, path: String, files: Int = 1,
      format: String = "parquet"): Unit =
    df.coalesce(files).write.mode("overwrite").format(format).save(path)

  /** Append one load batch into an existing partitioned fact —
    * dynamic partition overwrite of ONLY the batch's dates, so a
    * re-run of the same batch is idempotent and history is untouched. */
  def overwriteBatchPartitions(df: DataFrame, path: String, dateCol: String): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dateCol)
      .parquet(path)
}
