package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Bronze-layer CSV ingestion with the reference's load semantics
  * (SURVEY.md §2.1 S4–S13; reference originals
  * /root/reference/sql/02_load_data.sql:8-60 and
  * /root/reference/sql/01_create_tables.sql:13-31):
  *
  *  - file-format contract: header row, quoted fields, surrounding
  *    whitespace trimmed, empty string → NULL (S6)
  *  - every payload column lands as STRING — typing is the silver
  *    layer's job (bronze is immutable evidence)
  *  - load metadata: source filename (`METADATA$FILENAME`), per-file
  *    row number (`METADATA$FILE_ROW_NUMBER`), a per-load UUID, and
  *    the ingestion timestamp (S8/S9)
  *  - fail-fast parsing = Snowflake `ON_ERROR = ABORT_STATEMENT`
  *
  * Scale: the CSV scan parallelizes per file-split; the per-file row
  * number windows by `input_file_name` — one partition per FILE,
  * which is the correct grain (a 100 TB load is many files, so the
  * window parallelizes across them). CAVEAT: within one file the
  * ordering key is `monotonically_increasing_id`, which tracks
  * physical line order only while each file maps to a single split —
  * files above `spark.sql.files.maxPartitionBytes` (128 MB) split and
  * the id order across splits is an implementation accident. For
  * strict METADATA$FILE_ROW_NUMBER fidelity on jumbo files, raise
  * `maxPartitionBytes` past the largest file (bronze loads are
  * many-small-files; a single 100 GB CSV is the anti-pattern).
  */
object RawLoader {

  /** All-string schema for a named column list (bronze contract). */
  def rawSchema(columns: Seq[String]): StructType =
    StructType(columns.map(StructField(_, StringType, nullable = true)))

  /** S6–S9: read CSV files under `path` into the bronze frame. */
  def loadCsv(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("_source_file"))
      .orderBy(monotonically_increasing_id())
    spark.read
      .schema(rawSchema(columns))
      .option("header", "true")
      .option("quote", "\"")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("nullValue", "")
      .option("mode", "FAILFAST")
      .csv(path)
      .withColumn("_source_file", input_file_name())
      .withColumn("_source_row_number", row_number().over(w))
      .withColumn("_load_id", expr("uuid()"))
      .withColumn("_ingested_at", current_timestamp())
  }

  /** S5 (read side): JSON-lines bronze source with the same explicit
    * schema + load-metadata contract as [[loadCsv]] — the scraper's
    * second output format. PERMISSIVE-by-default JSON parsing is
    * overridden to FAILFAST for bronze parity with COPY INTO. */
  def loadJson(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("_source_file"))
      .orderBy(monotonically_increasing_id())
    spark.read
      .schema(rawSchema(columns))
      .option("mode", "FAILFAST")
      .json(path)
      .withColumn("_source_file", input_file_name())
      .withColumn("_source_row_number", row_number().over(w))
      .withColumn("_load_id", expr("uuid()"))
      .withColumn("_ingested_at", current_timestamp())
  }

  /** S4: single-file CSV sink with header (driver-side convenience —
    * coalesce(1) is for small exports only, never for fact data). */
  def writeCsv(df: DataFrame, path: String, single: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** S5: JSON-lines sink. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
