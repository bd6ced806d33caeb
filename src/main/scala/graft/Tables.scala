package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * Each loader is a plain `spark.read.parquet` so Catalyst's parquet
  * source handles column pruning + predicate pushdown; callers must
  * `select`/`filter` declaratively (never collect-then-filter) so the
  * pushdown reaches the scan. At 100 TB these directories would be
  * date-partitioned; the loaders stay valid because partition pruning
  * is applied by the same scan node.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's µs-precision
    * TimestampType cannot represent; with
    * spark.sql.legacy.parquet.nanosAsLong=true (set by every graft
    * session builder) it surfaces as LongType ns-since-epoch, which we
    * truncate to µs with integer division (`div` — ns epochs exceed
    * 2^53, so double division would corrupt them). DuckDB oracles
    * print at µs too, so both engines see identical instants. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
