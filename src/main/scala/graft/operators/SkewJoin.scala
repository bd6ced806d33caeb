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
    // The salt must be DETERMINISTIC per row: a random/positional salt
    // feeding a shuffle key can duplicate or drop rows when a lost
    // executor forces map-stage recomputation with a different draw
    // (the SPARK-23207 failure class). Hash every hashable column —
    // map-typed columns are excluded (hash() rejects MapType).
    // Limitation: fully-identical duplicate rows share a salt; dedupe
    // or add a row-id column upstream if the hot key is pure repeats.
    val hashable = large.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toIndexedSeq
    val salted = large.withColumn("_salt", pmod(hash(hashable: _*), lit(factor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Salted group-by count — the aggregation analogue: partial count
    * per (key, salt), then final sum per key. The salt comes from the
    * reading partition, NOT the key (a key-derived salt is constant
    * per key and splits nothing). Spark's partial aggregation already
    * does this for algebraic aggregates; this form is for building
    * skew-safe custom two-phase aggregations. */
  def saltedCount(df: DataFrame, keyCol: String, factor: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id(), lit(factor)))
      .groupBy(col(keyCol), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol)).agg(sum(col("_partial")).as("count"))

  /** Top-`factor` heavy-hitter keys with their frequencies — the
    * detection step for choosing between plain and salted plans. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int = 10): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol).asc)
      .limit(k)

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.operators.SkewJoin")

  /** Auto-dispatching skew-safe inner join: SAMPLE the large side's
    * key frequencies (seeded — the decision is reproducible), and pick
    * the plain join unless one key holds ≥ `hotShare` of the sampled
    * rows, in which case salt `factor` ways. Both branches produce the
    * identical row multiset (property-tested), so the dispatch only
    * ever changes the PLAN — a wrong detection costs performance,
    * never correctness.
    *
    * Scale shape: detection reads `sampleFraction` of the large side's
    * key columns only (column-pruned scan, two-level aggregate, one
    * 2-value driver fetch) — at 100 TB that is a bounded parameter
    * job, the same class as the k-means centroid fetch. The plain
    * branch leaves Spark free to broadcast the small side (asserted in
    * SkewJoinSpec); the salted branch spreads one hot key over
    * `factor` shuffle partitions where even AQE's split partitions
    * would hot-spot. */
  def joinSkewSafe(large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int = 16, sampleFraction: Double = 0.01,
      hotShare: Double = 0.2): DataFrame = {
    val skewed = detectSkew(large, keys, sampleFraction, hotShare)
    log.info(s"joinSkewSafe keys=${keys.mkString(",")} -> " +
      (if (skewed) s"SALTED x$factor" else "plain"))
    if (skewed) saltedJoin(large, small, keys, factor)
    else large.join(small, keys)
  }

  /** The dispatch decision itself, exposed so the branch choice is
    * testable (SkewJoinSpec pins both branches on crafted inputs, not
    * just the branches' result equivalence): seeded-sample the key
    * frequencies and report whether one key holds ≥ `hotShare` of the
    * sampled rows. Bounded parameter job — a column-pruned sampled
    * scan, two-level aggregate, one 2-value driver fetch. */
  def detectSkew(large: DataFrame, keys: Seq[String],
      sampleFraction: Double = 0.01, hotShare: Double = 0.2): Boolean = {
    require(sampleFraction > 0 && sampleFraction <= 1, "sampleFraction in (0, 1]")
    require(hotShare > 0 && hotShare <= 1, "hotShare in (0, 1]")
    val sampled = large.select(keys.map(col): _*).sample(sampleFraction, 42L)
    val stats = sampled.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot")).head()
    val (mx, tot) =
      if (stats.isNullAt(0)) (0L, 0L) else (stats.getLong(0), stats.getLong(1))
    tot > 0 && mx.toDouble / tot >= hotShare
  }
}
