package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of (temporal) join: for each left row, attach the
  * single right row with the greatest right-time ≤ left-time for the
  * same key — "the latest quote at or before this event". An operator
  * the reference's warehouse lacks but every financial/event pipeline
  * reaches for.
  *
  * Spark-first composition (no custom physical operator needed): tag
  * both sides, union by (key, time), and take a running
  * last-non-null of the right payload over a keyed window — i.e. a
  * merge-join expressed declaratively. Each side shuffles ONCE on the
  * key and sorts within partitions; cost is that of one window over
  * |L| + |R| rows. Compare the alternatives at 100 TB: a range join
  * (`l.ts >= r.ts`) explodes to O(|L|·|R|/keys) intermediate rows,
  * and a per-row subquery probe is not partition-parallel at all.
  *
  * Correctness details:
  *  - At equal timestamps the right row sorts FIRST (side tag 0 < 1),
  *    giving inclusive ≤ semantics.
  *  - The right payload rides in ONE struct column: `last(struct,
  *    ignoreNulls)` tracks the latest right ROW even when its payload
  *    fields are all NULL — per-column last() would silently fall
  *    back to an older row for a NULL field (wrong).
  *  - NULL times never match anything — enforced INSIDE the operator:
  *    right rows with a NULL time or any NULL key are dropped before
  *    the union (they could otherwise sort first under asc nulls-first
  *    and silently match every left row), and a left row with a NULL
  *    time or NULL key gets NULL as-of columns, matching SQL ASOF
  *    equality semantics (NULL = NULL is not a match).
  */
object AsOfJoin {

  /** Left rows + `<prefix><rightCol>` columns from the as-of matched
    * right row (NULL when no right row precedes). `right` must not
    * carry duplicate (keys, rightTime) combinations if deterministic
    * output is required — pre-aggregate if it does. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val payloadType = StructType(rightCols.map(c => right.schema(c)))
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_rpay", lit(null).cast(payloadType))
    // NULL-time / NULL-key right rows can never be "the latest quote at
    // or before" anything: drop them here rather than relying on every
    // caller to pre-filter. (A NULL right time would sort FIRST under
    // asc nulls-first with a non-null payload struct and match every
    // left row that has no later quote; a NULL key would co-group with
    // NULL-key left rows, diverging from SQL ASOF equality semantics.)
    // Left rows with NULL time/key need no filter: their window prefix
    // then contains only left rows, whose payload is NULL ⇒ no match.
    val r = right
      .filter((col(rightTime) +: keys.map(col)).map(_.isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTime).as("_t"),
          lit(0).as("_side"),
          struct(rightCols.map(col): _*).as("_rpay")): _*)
    // left columns absent on the right side become typed NULLs
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(rAligned)
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    rightCols.foldLeft(matched) { (df, c) =>
      df.withColumn(prefix + c, col("_match").getField(c))
    }.drop("_t", "_side", "_rpay", "_match")
  }
}
