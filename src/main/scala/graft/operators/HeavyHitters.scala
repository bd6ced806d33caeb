package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Guaranteed heavy hitters with O(k) state — Misra–Gries summaries
  * (the mergeable form of Agarwal et al., "Mergeable Summaries") plus
  * an exact candidate-only recount.
  *
  * The problem at 100 TB: "which tokens exceed x% of the corpus"
  * naively needs a full-vocabulary groupBy — a shuffle keyed by every
  * distinct token. The MG summary answers it with a k-entry map:
  * any item with true frequency > n/(k+1) is GUARANTEED present in
  * the summary (deterministically — no hash collisions, no
  * probability), and each summary count undercounts by at most
  * n/(k+1). The summary alone is merge-order-dependent, so this
  * operator never emits it: the ≤ k candidate keys are broadcast back
  * and exact-counted (a map-side semi-join — only candidate tokens
  * enter the count shuffle), and the threshold filter
  * `exact·(k+1) > n` keeps exactly the true heavy hitters. The OUTPUT
  * is therefore deterministic and equal to the plain
  * GROUP BY … HAVING answer — which is exactly what the oracle runs —
  * while the full-vocabulary shuffle never happens.
  *
  * vs [[Sketches]] CMS: CMS estimates any queried item's count
  * (overcounts, probabilistic) but cannot enumerate; MG enumerates a
  * guaranteed-complete candidate set. A production pipeline uses MG
  * to FIND the candidates and the recount join to certify them.
  */
object HeavyHitters {

  /** Mergeable Misra–Gries summary as a typed [[Aggregator]]:
    * `df.agg(udaf(mgAgg(k))(col))` → Map of ≤ k (item, count). Counts
    * undercount by ≤ n/(k+1); items above that threshold are always
    * present. Input must be non-NULL (filter first). */
  def mgAgg(k: Int): Aggregator[String, Map[String, Long], Map[String, Long]] = {
    require(k >= 1 && k <= 65536, "mgAgg needs 1 <= k <= 65536")
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      override def zero: Map[String, Long] = Map.empty
      override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
        b.get(x) match {
          case Some(c) => b.updated(x, c + 1L)
          case None if b.size < k => b.updated(x, 1L)
          case None =>
            // classic MG step: new item with all k slots full decrements
            // every counter (the new item's single unit cancels too)
            b.flatMap { case (key, c) => if (c > 1L) Some(key -> (c - 1L)) else None }
        }
      override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val sum = b.foldLeft(a) { case (m, (key, c)) =>
          m.updated(key, m.getOrElse(key, 0L) + c)
        }
        if (sum.size <= k) sum
        else {
          // mergeable-summaries offset: subtract the (k+1)-th largest
          // count from everything, drop non-positives — ≤ k survive and
          // the total error stays ≤ n/(k+1)
          val cut = sum.valuesIterator.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
          sum.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
        }
      }
      override def finish(r: Map[String, Long]): Map[String, Long] = r
      override def bufferEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoder[Map[String, Long]]()
      override def outputEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoder[Map[String, Long]]()
    }
  }

  /** Certified heavy hitters of `item` in `df`: all values with exact
    * count strictly above n/(k+1), as (item, n_exact, n_total) —
    * deterministic, equal to the full GROUP BY … HAVING answer, found
    * without a full-vocabulary shuffle. NULL items are excluded. The
    * integer form `n_exact·(k+1) > n` keeps the threshold exact. */
  def certified(df: DataFrame, item: Column, k: Int): DataFrame = {
    val vals = df.filter(item.isNotNull).select(item.cast("string").as("item"))
    val mg = udaf(mgAgg(k))
    val summary = vals.agg(mg(col("item")).as("mg"))
    val candidates = summary.select(explode(map_keys(col("mg"))).as("item"))
    val exact = vals.join(broadcast(candidates), Seq("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_exact"))
    val total = vals.agg(count(lit(1)).as("n_total"))
    exact.crossJoin(broadcast(total))
      .filter(col("n_exact") * lit((k + 1).toLong) > col("n_total"))
      .select(col("item"), col("n_exact"), col("n_total"))
  }
}
