package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Date-spine gap filling with last-observation-carried-forward — the
  * standard "densify the calendar" ETL step (dbt's date spine +
  * `lag ignore nulls` pattern; reference's daily models assume dense
  * dates downstream, this operator makes sparse series safe for them).
  *
  * Shape for 100 TB: the spine is derived per key from that key's own
  * [min, max] date bounds (one partial-aggregable rollup, output =
  * one row per key), exploded back to one row per key-day — output is
  * bounded by keys × span, never by input rows. The left join and the
  * LOCF window both hash on the key columns, so AQE reuses one
  * exchange; nothing driver-side, no global window.
  *
  * LOCF semantics: the first spine day of every key is observed by
  * construction (bounds come from the data), so the carried value is
  * never NULL. Fill values are carried bit-identically (no
  * re-arithmetic), so pre-rounded values stay oracle-exact.
  */
object Gapfill {

  /** Densify `df` (already at one-row-per-key-per-day grain) to a full
    * daily spine per key and LOCF-fill `valueCols`. Adds `is_gap`
    * (true on spine days absent from the input). `dateCol` must be a
    * DateType column. */
  def dailyLocf(df: DataFrame, keyCols: Seq[String], dateCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(valueCols.nonEmpty, "need at least one value column to fill")
    val keys = keyCols.map(col)
    val bounds = df.groupBy(keys: _*)
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
    val spine = bounds.select(
      keys :+ explode(sequence(col("__d0"), col("__d1"))).as(dateCol): _*)
    val joined = spine.join(
      df.withColumn("__obs", lit(true)), keyCols :+ dateCol, "left")
    val w = Window.partitionBy(keys: _*).orderBy(col(dateCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(joined) { (acc, v) =>
      acc.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled
      .withColumn("is_gap", coalesce(col("__obs"), lit(false)) === lit(false))
      .drop("__obs")
  }
}
