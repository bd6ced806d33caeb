package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range (interval) join: pairs of same-key rows where the
  * right time falls in [left-time − before, left-time + after] —
  * "views in the hour before each purchase". The naive formulation
  * (`l.key = r.key AND r.ts BETWEEN ...`) plans a non-equi join that
  * degenerates to per-key cartesian work; this implementation buckets
  * time into fixed-width bands and equi-joins on (key, bucket):
  *
  *  - every RIGHT row lands in exactly ONE bucket (floor(t/width));
  *  - every LEFT row explodes to the few buckets covering its window
  *    ((before+after)/width + 1 rows — 2 at the default width);
  *  - the equi-join on (key, bucket) finds every candidate pair
  *    exactly once (the right row exists in one bucket only, so no
  *    DISTINCT pass is needed), and the exact BETWEEN filter runs on
  *    candidates, never on the key-cartesian space.
  *
  * All shuffles are linear in |L|·(buckets/row) + |R|; skew follows
  * the (key, bucket) distribution, so hot keys spread across time
  * buckets instead of landing in one reducer. */
object RangeJoin {

  /** Inner-join pairs with right columns prefixed (`prefix` + name,
    * keys excluded). `before`/`after`/`width` in MICROSECONDS of the
    * two timestamp columns; width defaults to the window span so each
    * left row covers ≤ 2 buckets. */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      beforeUs: Long, afterUs: Long = 0L, widthUs: Long = 0L,
      prefix: String = "r_"): DataFrame = {
    require(beforeUs + afterUs > 0, "window must have positive span")
    val width = if (widthUs > 0) widthUs else beforeUs + afterUs
    val rRenamed = right.columns.foldLeft(right) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, prefix + c)
    }
    val rt = unix_micros(col(prefix + rightTime))
    val lt = unix_micros(col(leftTime))
    val l = left.withColumn("_bucket",
      explode(sequence(
        floor((lt - beforeUs) / width).cast("long"),
        floor((lt + afterUs) / width).cast("long"))))
    val r = rRenamed.withColumn("_bucket", floor(rt / width).cast("long"))
    l.join(r, keys :+ "_bucket")
      .filter(rt >= lt - beforeUs && rt <= lt + afterUs)
      .drop("_bucket")
  }
}
