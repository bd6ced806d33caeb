package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals — error bars for a mean
  * over a corpus too large to resample: the classical bootstrap draws
  * n rows WITH replacement per replica (a global operation no cluster
  * can do cheaply); the Poisson bootstrap replaces each row's
  * multiplicity with an independent Poisson(1) weight, which needs
  * only the ROW itself — map-side, one pass, B replicas at once
  * (Kleiner et al.'s scalable-bootstrap lineage; the standard trick
  * in production metric pipelines).
  *
  * Everything is deterministic and oracle-replayable:
  *  - the per-(row, replica) uniform comes from the engine-portable
  *    multiplicative hash family used across this repo (no RNG
  *    state);
  *  - Poisson(1) multiplicities come from an inverse-CDF comparison
  *    ladder whose cumulative probabilities e⁻¹·Σ1/k! are
  *    driver-computed constants embedded as identical double
  *    literals on both engines (the [[graft.analytics.StatsOps]]
  *    Benford policy), capped at 8 (the clipped tail P(X>8) ≈ 1e-6
  *    lands on w=8, identically on both sides);
  *  - replica means are ratios of decimal-exact weighted sums
  *    (order-independent);
  *  - the CI bounds are exact order statistics of the B replica
  *    means — a rank pick over B rows, not a percentile sketch.
  *
  * Scale shape: the B-way explode is map-side (sequence + explode),
  * the weighted sums partial-aggregate per partition, and the ONE
  * shuffle carries B × partitions partial rows; the rank pick runs
  * on B rows. State is O(B) everywhere.
  */
object Bootstrap {

  /** Hash modulus shared with the repo's portable family. */
  private val P = TextDedup.P

  /** Cumulative Poisson(1) CDF values P(X ≤ k), k = 0..7 —
    * driver-computed once, embedded identically in plan and oracle. */
  val PoissonCdf: Seq[Double] = {
    val pmf = (1 to 7).scanLeft(math.exp(-1.0)) { case (p, k) => p / k } // pmf(0)..pmf(7)
    pmf.scanLeft(0.0)(_ + _).tail // cdf(0)..cdf(7)
  }

  /** Deterministic uniform in [0, 1) for (key, replica): the repo's
    * MinHash permutation family ((2r+1)·h + 999983·r) mod P over
    * h = ((key mod P)·2654435761) mod P. The per-replica MULTIPLIER
    * matters: an additive-only replica term (h + r·c) would step a
    * row's uniform by only c/P ≈ 0.001 per replica, leaving all B
    * replicas with nearly identical weights — correlated resamples
    * and a collapsed CI (observed before this form). (2r+1)·h gives
    * each replica a per-row step of (2h + 999983) mod P, huge and
    * row-dependent. Key is reduced mod P BEFORE the multiply so any
    * non-negative 64-bit id stays clear of long overflow
    * ((P−1)·2654435761 < 2⁶³, then (2·4095+1)·(P−1) ≪ 2⁶³). */
  private def uniform(key: Column, replica: Column): Column = {
    val h = pmod(pmod(key.cast("long"), lit(P)) * lit(2654435761L), lit(P))
    pmod((replica * lit(2L) + lit(1L)) * h + lit(999983L) * replica, lit(P))
      .cast("double") / lit(P.toDouble)
  }

  /** Poisson(1) multiplicity via the inverse-CDF ladder: the count of
    * CDF rungs at or below u. */
  private def poissonW(u: Column): Column =
    PoissonCdf.map(c => when(u >= lit(c), 1L).otherwise(0L)).reduce(_ + _)

  /** Bootstrap CI for the mean of `value`: one row —
    * (n, mean_micro, lo_micro, hi_micro) with the (α/2, 1−α/2)
    * bounds as exact order statistics of `nReplicas` Poisson-replica
    * means, all in integer micro units. `key` must be a stable
    * NON-NEGATIVE per-row id (uniqueness makes replicas independent
    * across rows — collisions would correlate those rows' weights;
    * negative keys would split Spark's pmod from the oracle's `%`).
    * NULL values and keys are excluded. */
  def meanCi(df: DataFrame, value: Column, key: Column, nReplicas: Int = 64,
      alpha: Double = 0.05, scale: Int = 2): DataFrame = {
    require(nReplicas >= 4 && nReplicas <= 4096, "nReplicas must be in [4, 4096]")
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(scale >= 0 && scale <= 6, "scale must be in [0, 6]")
    val q = math.pow(10, scale)
    // 1-based ranks of the lower/upper order statistics among B means
    val loRank = math.max(1, math.floor(nReplicas * (alpha / 2)).toInt + 1)
    val hiRank = math.min(nReplicas, math.floor(nReplicas * (1 - alpha / 2)).toInt + 1)
    val vals = df.filter(value.isNotNull && key.isNotNull)
      .select(floor(value.cast("double") * lit(q) + lit(0.5)).cast("long").as("xi"),
        key.cast("long").as("k"))
    val exploded = vals
      .select(col("xi"), col("k"), explode(sequence(lit(0L), lit(nReplicas - 1L))).as("r"))
      .select(col("xi"), col("r"), poissonW(uniform(col("k"), col("r"))).as("w"))
    val replicas = exploded.groupBy(col("r"))
      .agg(sum((col("w") * col("xi")).cast("decimal(38,0)")).as("swx"),
        sum(col("w").cast("decimal(38,0)")).as("sw"))
      // an all-zero-weight replica (possible only for tiny n) has no
      // mean — drop it from the order statistics, identically on both
      // engines
      .filter(col("sw") > 0)
      .select(col("r"), (col("swx").cast("double") / col("sw").cast("double") / lit(q))
        .as("rm"))
    // rank pick over <= B rows; constant non-foldable partition key
    // states the one-partition intent (bounded frame, see HistQuantiles)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("r"), lit(1L)))
      .orderBy(col("rm").asc, col("r").asc)
    val ranked = replicas.withColumn("rk", row_number().over(w))
    val bounds = ranked.agg(
      min(when(col("rk") === lit(loRank), col("rm"))).as("lo"),
      min(when(col("rk") === lit(hiRank), col("rm"))).as("hi"))
    val stats = vals.agg(count(lit(1)).as("n"),
      sum(col("xi").cast("decimal(38,0)")).as("sx"))
    def micro(c: Column): Column = floor(c * lit(1e6) + lit(0.5)).cast("long")
    stats.crossJoin(broadcast(bounds))
      .select(col("n"),
        when(col("n") > 0, micro(col("sx").cast("double") / col("n").cast("double") / lit(q)))
          .otherwise(lit(null).cast("long")).as("mean_micro"),
        micro(col("lo")).as("lo_micro"),
        micro(col("hi")).as("hi_micro"))
  }
}
