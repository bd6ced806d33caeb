package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k as a BOUNDED-STATE aggregation — the 100 TB
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY s)
  * <= k` pattern on corpus-scale frames.
  *
  * Why the window form doesn't scale as the per-group SELECTION
  * primitive: WindowExec shuffles EVERY row of the corpus to its
  * group's partition and sorts the whole partition (external sort —
  * it spills rather than OOMs, but the full data volume crosses the
  * exchange and hits the sort, only to throw away all but k·groups
  * rows). The aggregator form keeps an O(k) heap per group and
  * PARTIAL-AGGREGATES: each map task reduces its slice to ≤ k rows
  * per group before the exchange, so the shuffle carries at most
  * partitions × groups × k tuples no matter how large the corpus is,
  * and a skewed group costs its heap merges, not a one-reducer sort
  * of its entire row set. (The global-top-k analogue is Spark's own
  * TakeOrderedAndProject; this is the grouped version Spark lacks.)
  *
  * Determinism: ordering is (score DESC, id ASC) — a TOTAL order, so
  * the result is independent of partitioning and merge order and
  * replays exactly as a `row_number` oracle with the same ORDER BY.
  */
object TopK {

  /** Typed [[Aggregator]] keeping the top `k` (score, id) pairs by
    * (score DESC, id ASC): `groupBy(g).agg(udaf(topKAgg(k))(score,
    * id))`. Buffer invariant: sorted by the total order, size ≤ k.
    * Works unchanged in Structured Streaming aggregations (state is
    * the O(k) buffer). Inputs must be non-NULL (filter first) and
    * scores non-NaN; duplicate ids are kept as distinct rows, exactly
    * as `row_number` would rank them. */
  def topKAgg(k: Int): Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] = {
    require(k >= 1 && k <= 65536, "topKAgg needs 1 <= k <= 65536")
    new Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      override def zero: Seq[(Double, Long)] = Vector.empty
      override def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
        insert(b, x)
      override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
        b.foldLeft(a)(insert)
      override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
      override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        ExpressionEncoder[Seq[(Double, Long)]]()
      override def outputEncoder: Encoder[Seq[(Double, Long)]] =
        ExpressionEncoder[Seq[(Double, Long)]]()
      private def before(a: (Double, Long), b: (Double, Long)): Boolean =
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
      private def insert(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
        if (b.size >= k && !before(x, b.last)) b
        else {
          val merged = (b :+ x).sortWith(before)
          if (merged.size > k) merged.take(k) else merged
        }
    }
  }

  /** Per-group top-k frame: one row per kept (group, rank) —
    * (g, rank, id, score), rank 1-based in (score DESC, id ASC)
    * order. NULL keys/ids/scores are excluded (NULL never ranks), and
    * so are NaN scores: NaN breaks the buffer's total order (every
    * comparison is false), which would silently drop or mis-sort rows
    * depending on arrival order — the documented non-NaN precondition
    * is enforced here, not assumed. */
  def topKByKey(df: DataFrame, g: Column, score: Column, id: Column, k: Int): DataFrame = {
    val agg = udaf(topKAgg(k))
    df.filter(g.isNotNull && score.isNotNull && !isnan(score.cast("double")) && id.isNotNull)
      .groupBy(g.as("g"))
      .agg(agg(score.cast("double"), id.cast("long")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("t._2").as("id"), col("t._1").as("score"))
  }
}
