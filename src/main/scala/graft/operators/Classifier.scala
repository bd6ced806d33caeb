package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Trained quality classifier — the fasttext-style filter step of a
  * training-data pipeline (score every document with a learned linear
  * model; keep/bucket by score), self-contained in the engine: batch
  * gradient descent over a DataFrame, no ML library.
  *
  * The link is the SOFTSIGN sigmoid σ(z) = 0.5 + 0.5·z/(1+|z|) — the
  * standard algebraic substitute for the logistic link (same shape,
  * same (0,1) range, same 0.5-at-0 decision point) chosen here
  * because it uses ONLY +,−,×,÷,|·| on doubles: every step of
  * training is an IEEE-exact expression both engines evaluate
  * identically, so a SQL oracle can replay the whole training loop
  * bit-for-bit — the same replayability policy as the k-means
  * trainer ([[KMeans]]) and the portable log2 ladder
  * ([[LanguageModel]]). A libm `exp` in the middle of training would
  * make every downstream weight engine-dependent.
  *
  * Determinism / order-independence: per-row gradient contributions
  * are quantized to the 1e-6 grid (exact int64 sums ⇒ identical on 1
  * or 1000 executors); the weight update runs on the driver in plain
  * double arithmetic from those exact sums, and the next iteration
  * embeds the weights as literals (a bounded PARAMETER, the same
  * class as k-means centroids).
  *
  * Scale shape per iteration: one map-side projection (margin, link,
  * residual — all codegen'd builtins) and ONE partial-aggregable
  * global aggregate of d+2 columns; the corpus is read from the
  * cached feature frame and never shuffled. Driver state is O(d).
  */
object Classifier {

  /** Softsign sigmoid σ(z) = 0.5 + 0.5·z/(1+|z|): algebraic, exact on
    * every IEEE engine, monotone, σ(0) = 0.5 exactly. */
  def sigmoidSoftsign(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** The linear margin b + Σ wᵢ·xᵢ with weights embedded as literals,
    * associated left-to-right (the oracle writes the same chain). */
  private def margin(weights: Array[Double], features: Seq[Column]): Column =
    features.zipWithIndex.foldLeft(lit(weights(0)): Column) {
      case (acc, (x, i)) => acc + lit(weights(i + 1)) * x
    }

  /** `nIter` batch-GD steps on ROWS WHERE label AND every feature are
    * non-NULL; returns (bias +: feature weights). Label must be 0/1.
    * Weights start at 0 (⇒ iteration 1 scores every row p = 0.5
    * exactly, on both engines). Empty input returns the zero vector.
    *
    * Update rule per iteration, replayed verbatim by the oracle:
    *   gᵢ = (Σ floor((p−y)·xᵢ·1e6 + 0.5)) / 1e6 / n
    *   wᵢ ← wᵢ − lr·gᵢ
    */
  def fitSoftsignLogit(df: DataFrame, features: Seq[Column], label: Column,
      nIter: Int = 3, lr: Double = 0.5): Array[Double] = {
    require(nIter >= 1 && nIter <= 64, "nIter must be in [1, 64]")
    require(lr > 0 && lr.isFinite, "lr must be positive and finite")
    val cols = label.cast("double").as("y") +:
      features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"x$i") }
    val frame = df.select(cols: _*)
      .filter((0 until features.size).map(i => col(s"x$i").isNotNull)
        .foldLeft(col("y").isNotNull)(_ && _))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val w = new Array[Double](features.size + 1)
      var iter = 0
      var n = -1L
      while (iter < nIter && n != 0) {
        val z = margin(w, (0 until features.size).map(i => col(s"x$i")))
        val resid = sigmoidSoftsign(z) - col("y")
        val aggs = count(lit(1)).as("n") +:
          sum(floor(resid * lit(1e6) + lit(0.5)).cast("long")).as("s0") +:
          (0 until features.size).map(i =>
            sum(floor(resid * col(s"x$i") * lit(1e6) + lit(0.5)).cast("long")).as(s"s${i + 1}"))
        val row = frame.agg(aggs.head, aggs.tail: _*).head()
        n = row.getLong(0)
        if (n > 0) {
          var i = 0
          while (i <= features.size) {
            w(i) = w(i) - lr * (row.getLong(i + 1).toDouble / 1e6 / n.toDouble)
            i += 1
          }
        }
        iter += 1
      }
      w
    } finally frame.unpersist(blocking = false)
  }

  /** Map-side scoring with trained weights: adds `z` (margin), `p`
    * (softsign-sigmoid score in (0,1)) and `pred` (p ≥ 0.5 ⇔ z ≥ 0,
    * stated on the margin so no link evaluation can move the
    * boundary). */
  def score(df: DataFrame, features: Seq[Column], weights: Array[Double]): DataFrame = {
    require(weights.length == features.size + 1,
      s"need ${features.size + 1} weights (bias first), got ${weights.length}")
    val z = margin(weights, features.map(_.cast("double")))
    df.withColumn("z", z)
      .withColumn("p", sigmoidSoftsign(col("z")))
      .withColumn("pred", (col("z") >= lit(0.0)).cast("int"))
  }
}
