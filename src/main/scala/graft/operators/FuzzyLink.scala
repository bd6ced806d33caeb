package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: candidate pairs come from cheap
  * equi-joins, survivors pass an edit-distance cut — the classic
  * entity-resolution shape (block → compare → match).
  *
  * Shape for 100 TB, by distance cut:
  *
  *  - `maxDist <= 1`: DELETION-NEIGHBORHOOD candidates (the FastSS /
  *    SymSpell scheme — Bocek et al., "Fast Similarity Search in
  *    Large Dictionaries", 2007). Each string emits itself plus its
  *    `len` single-character deletions as join keys; two strings
  *    within edit distance 1 ALWAYS share a key (substitution: both
  *    drop the differing char; indel: the shorter string IS a
  *    deletion of the longer; equality: the string itself), so the
  *    equi-join on (block, variant) finds every true pair and the
  *    bounded distance only verifies the candidate stream. Cost is
  *    O(n·len) generated keys and a candidate set near the true-pair
  *    count — NOT Σ|block|² — so a shared long prefix inside a block
  *    (the failure mode of purely quadratic blocking) costs nothing.
  *  - `maxDist >= 2`: quadratic in-block compare. The only join is
  *    hash-partitioned on the blocking key, so cost is Σ|block|² over
  *    blocks, not |table|² — the block key is the user's knob for
  *    that trade (nation, zip, name prefix, phonetic code …). Two
  *    pushed predicates keep the quadratic term honest: `id_a < id_b`
  *    halves the pair space, and a length-band check
  *    (|len(a)−len(b)| ≤ maxDist, a lower bound on edit distance)
  *    rejects most non-matches before any distance is computed.
  *
  * Both paths verify with Spark's bounded form
  * `levenshtein(a, b, threshold)`, which abandons a pair as soon as
  * the running distance exceeds the cut — O(maxDist·min(len)) per
  * pair, not O(len²).
  */
object FuzzyLink {

  /** The string itself plus all single-character deletions, as an
    * array of join keys (codegen'd; NULL input → NULL array, so
    * explode drops the row — NULL strings never match). */
  private def delVariants(s: Column): Column =
    when(length(s) === 0, array(s)).otherwise(
      concat(array(s), transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s) - i)))))

  /** Self-match `df` on fuzzy `strCol` within `blockCols` blocks:
    * pairs (id_a < id_b) whose edit distance is ≤ `maxDist`. Output
    * columns: blockCols, id_a, id_b, str_a, str_b, dist. NULL strings
    * and NULL block keys never match (equi-join + distance on NULL
    * both yield NULL). */
  def selfMatch(df: DataFrame, idCol: String, strCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column — an unblocked fuzzy join is all-pairs")
    require(maxDist >= 0 && maxDist <= 8, "maxDist must be in 0..8 (larger cuts defeat the bounded distance)")
    // bounded levenshtein returns -1 once the running distance passes
    // the threshold; <= maxDist therefore never sees a false positive
    val dist = levenshtein(col("str_a"), col("str_b"), maxDist)
    val pairs =
      if (maxDist <= 1) {
        val keyed = df.select(
            blockCols.map(col) :+ col(idCol) :+ col(strCol): _*)
          .withColumn("_variant", explode(delVariants(col(strCol))))
        val a = keyed.select(
          blockCols.map(col) :+ col(idCol).as("id_a") :+ col(strCol).as("str_a") :+ col("_variant"): _*)
        val b = keyed.select(
          blockCols.map(col) :+ col(idCol).as("id_b") :+ col(strCol).as("str_b") :+ col("_variant"): _*)
        // a true pair can share several variants (equal strings share
        // them all) — distinct before the verify so each candidate is
        // scored once and output rows stay unique
        a.join(b, blockCols :+ "_variant")
          .where(col("id_a") < col("id_b"))
          .select(blockCols.map(col) :+ col("id_a") :+ col("id_b")
            :+ col("str_a") :+ col("str_b"): _*)
          .distinct()
      } else {
        val left = df.select(
          blockCols.map(col) :+ col(idCol).as("id_a") :+ col(strCol).as("str_a"): _*)
        val right = df.select(
          blockCols.map(col) :+ col(idCol).as("id_b") :+ col(strCol).as("str_b"): _*)
        left.join(right, blockCols)
          .where(col("id_a") < col("id_b") &&
            abs(length(col("str_a")) - length(col("str_b"))) <= lit(maxDist))
      }
    pairs
      .withColumn("dist", dist)
      .where(col("dist") >= 0 && col("dist") <= lit(maxDist))
  }
}
