package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** `events.ts` normalization — the harness has shipped this column
    * in two physical shapes across rounds, and this loader accepts
    * both so every downstream operator sees one logical type
    * (µs-precision TimestampType, UTC session):
    *
    *  - TIMESTAMP(NANOS): Spark's µs TimestampType cannot represent
    *    it; with spark.sql.legacy.parquet.nanosAsLong=true (set by
    *    every graft session builder) it surfaces as LongType
    *    ns-since-epoch, truncated to µs with integer division (`div`
    *    — ns epochs exceed 2^53, so double division would corrupt
    *    them);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): NTZ at the parquet
    *    level. Session builders disable inferTimestampNTZ so it reads
    *    as plain TIMESTAMP, but if a foreign session (driver-owned)
    *    infers NTZ anyway, the cast below re-anchors it in the UTC
    *    session zone — the same instants DuckDB's naive timestamps
    *    print.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
