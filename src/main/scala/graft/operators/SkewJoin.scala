package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins (SURVEY.md §7.5 / task brief: "salting for
  * skew"). AQE's skew-join handles most cases at runtime by splitting
  * oversized partitions; explicit salting remains the tool when one
  * key dominates so heavily that even split partitions hot-spot, or
  * when AQE is unavailable (streaming joins, some nested plans).
  *
  * Semantics: identical row multiset to the plain equi-join — proven
  * by property test. Mechanics: the skewed (large) side gets a
  * deterministic per-row salt in [0, factor); the dimension side is
  * replicated `factor` times; the join key becomes (key, salt), so
  * one hot key spreads over `factor` shuffle partitions.
  */
object SkewJoin {

  /** Inner equi-join of `large` (skewed) with `small` on `keys`,
    * salted `factor` ways. `small` is replicated `factor`× — size its
    * replication accordingly (a dim of d rows becomes d·factor). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int = 16): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // The salt value never reaches the output (each large row joins the
    // small side exactly at its own salt, then _salt is dropped), so
    // correctness does not depend on WHICH salt a row gets — only the
    // distribution does. rand(seed) spreads even fully-duplicate hot-key
    // rows uniformly (a content hash would send identical rows to one
    // bucket) and is retry-stable per partition in practice; results
    // are identical either way.
    val salted = large.withColumn("_salt",
      floor(rand(42) * factor).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Salted group-by count — the aggregation analogue: partial count
    * per (key, salt), then final sum per key. Spark's partial
    * aggregation already does this for algebraic aggregates; this form
    * is for building skew-safe custom two-phase aggregations. */
  def saltedCount(df: DataFrame, keyCol: String, factor: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(hash(col(keyCol)), lit(factor)))
      .groupBy(col(keyCol), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol)).agg(sum(col("_partial")).as("count"))

  /** Top-`factor` heavy-hitter keys with their frequencies — the
    * detection step for choosing between plain and salted plans. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int = 10): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol).asc)
      .limit(k)
}
