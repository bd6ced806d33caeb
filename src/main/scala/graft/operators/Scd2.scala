package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history builder: turn an append-only change log
  * (key, change-time, attributes) into versioned dimension rows with
  * `[valid_from, valid_to)` intervals and an `is_current` flag — what
  * dbt snapshots / warehouse `MERGE`-based SCD jobs produce, expressed
  * as two keyed windows (one shuffle on the key; high key cardinality
  * parallelizes at any scale; no MERGE loop, no driver state).
  *
  * Consecutive versions with unchanged attributes are collapsed by
  * default (`collapseNoChange`) using a null-safe struct comparison —
  * per-column compares would mis-collapse when an attribute flips to
  * NULL and back. Interval semantics: half-open — a version is live
  * from its change instant (inclusive) until the next change instant
  * (exclusive); the last version has NULL `valid_to`.
  *
  * Determinism: pass `tiebreakCols` when a key may carry two changes
  * at the same instant; without a total order the collapse step and
  * interval chain are run-dependent.
  */
object Scd2 {

  def fromChangeLog(changes: DataFrame, keys: Seq[String], tsCol: String,
      attrCols: Seq[String], tiebreakCols: Seq[String] = Nil,
      collapseNoChange: Boolean = true): DataFrame = {
    require(keys.nonEmpty && attrCols.nonEmpty, "SCD2 needs keys and tracked attributes")
    val ord = col(tsCol).asc +: tiebreakCols.map(col(_).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    val base =
      if (collapseNoChange)
        changes.withColumn("_prev_attrs", lag(attrs, 1).over(w))
          .filter(col("_prev_attrs").isNull || !(col("_prev_attrs") <=> attrs))
          .drop("_prev_attrs")
      else changes
    // second window runs over the COLLAPSED rows: valid_to must chain
    // to the next *surviving* version, not the next raw change
    base
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
