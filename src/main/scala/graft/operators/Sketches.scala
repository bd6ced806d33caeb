package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.GraftFunctions

/** Distinct-cardinality sketches for corpus profiling at 100 TB:
  * KMV (k minimum values, Bar-Yossef et al. 2002) — keep the k
  * smallest distinct hash values of a column; the k-th smallest order
  * statistic estimates the full distinct count as `(k-1)·P / h_k`
  * (hashes uniform on [0, P)), with relative standard error
  * ≈ 1/√(k−2).
  *
  * Why KMV and not HyperLogLog here: a KMV sketch is pure order
  * statistics of the engine-portable char-fold hash, so the DuckDB
  * oracle replays the ENTIRE computation (hashing, the min-k cut, the
  * estimator arithmetic) and the hash gate covers an approximate
  * operator exactly — HLL register layouts are engine-private and can
  * only ever get a tolerance check. KMV sketches are also mergeable
  * (union = k smallest of the merged min-sets — property-tested), which
  * is what makes them a sketch and not a sample: per-partition,
  * per-day, or per-corpus sketches combine without rescanning.
  *
  * Scale shape: the distinct-hash reduction is a map-side-combinable
  * aggregation on thin longs — for heavy-duplication domains (tokens,
  * shingles: vocab ≪ corpus) the shuffle is O(distinct), not
  * O(corpus) — and the min-k cut is TakeOrderedAndProject (per-
  * partition top-k, no global sort). The sketch itself is k longs.
  */
object Sketches {

  /** Hash space modulus — shared with every portable text hash. */
  val P: Long = TextDedup.P

  /** Portable char-fold hash of a single string column (the same
    * `(acc·31 + codepoint) mod P` family the oracles replay), via the
    * native kernel over a 1-element array. */
  def portableHash(c: Column): Column =
    element_at(GraftFunctions.tokenHashes(array(c)), 1)

  /** The KMV hash: char-fold, then a Knuth multiplicative scatter
    * `(h · 2654435761) mod P`. The raw fold is a fine identity
    * fingerprint, but on structured inputs (sequential ids) its
    * residues are not uniform enough for ORDER STATISTICS — the
    * estimator under-read 31% on 20k sequential keys; with the
    * scatter it reads within 2.3%. The product stays below 2^63
    * (h < P ≈ 1e9, multiplier < 2.7e9), so both engines evaluate the
    * identical exact integer expression. */
  def kmvHash(c: Column): Column =
    (portableHash(c) * lit(2654435761L)) % lit(P)

  /** The KMV sketch: k smallest DISTINCT scattered hashes of `c`
    * (fewer rows when the column has < k distinct values — the sketch
    * is exact below k). NULLs are excluded. */
  def kmvSketch(df: DataFrame, c: Column, k: Int): DataFrame = {
    require(k >= 2, "kmvSketch needs k >= 2")
    GraftFunctions.register(df.sparkSession)
    df.where(c.isNotNull).select(kmvHash(c).as("h"))
      .distinct()
      .orderBy(col("h").asc)
      .limit(k)
  }

  /** Merge two sketches built with the same k: the k smallest of the
    * union of their min-sets — exactly the sketch of the combined
    * input (property-tested). */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionAll(b).distinct().orderBy(col("h").asc).limit(k)

  /** Distinct-count estimate from a sketch: exact when the sketch is
    * under-full (m < k ⇒ the column had exactly m distinct hashes),
    * otherwise `(k-1)·P / h_k` floored. One row:
    * (k, m, kth_hash, n_est). */
  def estimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("m"), max(col("h")).as("kth_hash"))
      .select(
        lit(k).as("k"), col("m"), col("kth_hash"),
        when(col("m") < k, col("m"))
          .otherwise(floor(lit((k - 1).toDouble * P) / col("kth_hash").cast("double"))
            .cast("long"))
          .as("n_est"))

  /** [[kmvSketch]] + [[estimate]] in one call. */
  def kmvEstimate(df: DataFrame, c: Column, k: Int): DataFrame =
    estimate(kmvSketch(df, c, k), k)

  /** PER-GROUP KMV as a typed [[Aggregator]]: `groupBy(g).agg(
    * kmvAgg(k).toColumn)` builds every group's min-k set in ONE pass
    * with O(k) state per group — reduce inserts and trims, merge
    * unions and trims, both orders of magnitude under a per-group
    * distinct. This is the sketch's native form in a warehouse
    * (distinct users per day, distinct tokens per language) and works
    * unchanged in Structured Streaming aggregations. Input is the
    * ALREADY-HASHED value ([[kmvHash]]); output is the sorted min-k
    * array, ready for [[estimateFromMins]]. */
  def kmvAgg(k: Int): Aggregator[Long, Seq[Long], Seq[Long]] =
    new Aggregator[Long, Seq[Long], Seq[Long]] {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      // buffer invariant: sorted ascending, distinct, size <= k
      override def zero: Seq[Long] = Vector.empty
      override def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)
      override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
        b.foldLeft(a)(insert)
      override def finish(r: Seq[Long]): Seq[Long] = r
      override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
      override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
      private def insert(b: Seq[Long], h: Long): Seq[Long] =
        if (b.contains(h) || (b.size >= k && h >= b.last)) b
        else {
          val merged = (b :+ h).sorted
          if (merged.size > k) merged.take(k) else merged
        }
    }

  /** Estimator over a min-k ARRAY column (the [[kmvAgg]] output,
    * sorted ascending): exact below k, else `(k-1)·P / max`. Lets the
    * per-group form reuse the identical arithmetic the global
    * [[estimate]] uses. */
  def estimateFromMins(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * P) / element_at(mins, -1).cast("double"))
        .cast("long"))

  /** Set-overlap estimate between two columns from their sketches
    * (inclusion–exclusion over KMV union): |A∪B| from the merged
    * sketch, |A∩B| = |A| + |B| − |A∪B|, clamped at 0. One row:
    * (n_a, n_b, n_union, n_intersect). The oracle replays all four
    * estimators; at warehouse scale the two input sketches would be
    * materialized per-corpus and only the k-long min-sets move. */
  def kmvOverlap(a: DataFrame, ca: Column, b: DataFrame, cb: Column, k: Int): DataFrame = {
    val sa = kmvSketch(a, ca, k)
    val sb = kmvSketch(b, cb, k)
    val ea = estimate(sa, k).select(col("n_est").as("n_a"))
    val eb = estimate(sb, k).select(col("n_est").as("n_b"))
    val eu = estimate(merge(sa, sb, k), k).select(col("n_est").as("n_union"))
    ea.crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
      .select(col("n_a"), col("n_b"), col("n_union"),
        greatest(col("n_a") + col("n_b") - col("n_union"), lit(0L)).as("n_intersect"))
  }
}
