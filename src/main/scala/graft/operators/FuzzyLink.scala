package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: candidate pairs come from a cheap
  * equi-join on blocking keys, survivors pass an edit-distance cut —
  * the classic entity-resolution shape (block → compare → match).
  *
  * Shape for 100 TB: the only join is hash-partitioned on the blocking
  * key, so cost is Σ |block|² over blocks, not |table|² — the block
  * key is the user's knob for that trade (nation, zip, name prefix,
  * phonetic code …). Two pushed predicates keep the quadratic term
  * honest: `id_a < id_b` halves the pair space, and a length-band
  * check (|len(a)−len(b)| ≤ maxDist, a lower bound on edit distance)
  * rejects most non-matches before any distance is computed. The
  * distance itself runs through Spark's bounded form
  * `levenshtein(a, b, threshold)` which abandons a pair as soon as the
  * running distance exceeds the cut — O(maxDist·min(len)) per pair,
  * not O(len²).
  */
object FuzzyLink {

  /** Self-match `df` on fuzzy `strCol` within `blockCols` blocks:
    * pairs (id_a < id_b) whose edit distance is ≤ `maxDist`. Output
    * columns: blockCols, id_a, id_b, str_a, str_b, dist. NULL strings
    * and NULL block keys never match (equi-join + distance on NULL
    * both yield NULL). */
  def selfMatch(df: DataFrame, idCol: String, strCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column — an unblocked fuzzy join is all-pairs")
    require(maxDist >= 0 && maxDist <= 8, "maxDist must be in 0..8 (larger cuts defeat the bounded distance)")
    val left = df.select(
      blockCols.map(col) :+ col(idCol).as("id_a") :+ col(strCol).as("str_a"): _*)
    val right = df.select(
      blockCols.map(col) :+ col(idCol).as("id_b") :+ col(strCol).as("str_b"): _*)
    // bounded levenshtein returns -1 once the running distance passes
    // the threshold; <= maxDist therefore never sees a false positive
    val dist = levenshtein(col("str_a"), col("str_b"), maxDist)
    left.join(right, blockCols)
      .where(col("id_a") < col("id_b") &&
        abs(length(col("str_a")) - length(col("str_b"))) <= lit(maxDist))
      .withColumn("dist", dist)
      .where(col("dist") >= 0 && col("dist") <= lit(maxDist))
  }
}
