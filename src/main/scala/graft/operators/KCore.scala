package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition: the maximal subgraph in which every node has
  * degree ≥ k — the graph-curation complement of [[Components]]
  * (who is connected) and [[PageRank]] (who is central): the k-core
  * isolates the DENSE part of a duplicate/citation graph, where
  * template farms and boilerplate hubs live, and is the standard
  * pre-filter before community detection.
  *
  * Algorithm: iterative peeling (Matula–Beck) — repeatedly drop nodes
  * with degree < k; what survives is exactly the k-core, independent
  * of peel order (the fixpoint is unique, which is what makes an
  * engine-neutral oracle possible). Each round is one partial-agg
  * degree count + two semi-joins — shuffle-partitionable, no
  * driver-side graph state. Rounds are bounded by the peel depth
  * (≤ longest chain of cascading removals); near-dup graphs are
  * near-cliques and settle in 2–3 rounds. Per-round frames are
  * `localCheckpoint`ed with the same lazy-materialize/count fusion
  * and O(1) block-manager discipline as [[Components]] — see there
  * for why persist alone is not enough for iterative DataFrames.
  */
object KCore {

  /** Edge budget for the exact driver path — the same bound class as
    * [[Components.DriverEdgeLimit]] / [[PageRank.DriverEdgeLimit]]. */
  val DriverEdgeLimit: Long = 1L << 21

  /** Nodes of the k-core of the undirected graph in `edges`, with
    * their in-core degree: (id, core_deg), core_deg ≥ k. Empty when
    * no k-core exists. Self-loops are dropped and edge direction is
    * ignored ([[Components.symmetrize]] — the same graph semantics as
    * every other graph operator here).
    *
    * Adaptive execution (the [[Components.connectedComponents]]
    * pattern): at or under `driverEdgeLimit` edges (one bounded
    * limit-probe) the peel runs exactly on the driver
    * ([[kCoreLocal]] — Matula–Beck with a cascade queue, zero
    * per-round job latency); above it the distributed round loop
    * runs. The fixpoint is unique, so both paths return the identical
    * (id, core_deg) set (pinned in KCoreSpec with
    * `driverEdgeLimit = 0`). */
  def kCore(edges: DataFrame, src: String = "src", dst: String = "dst",
      k: Int = 2, maxIter: Int = 50,
      driverEdgeLimit: Long = DriverEdgeLimit): DataFrame = {
    require(k >= 1, "kCore needs k >= 1")
    val spark = edges.sparkSession
    val norm = edges.select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .filter(col("src") =!= col("dst") && col("src").isNotNull && col("dst").isNotNull)
    if (driverEdgeLimit > 0 && norm.limit((driverEdgeLimit + 1).toInt).count() <= driverEdgeLimit) {
      import spark.implicits._
      return spark.createDataset(
          kCoreLocal(norm.as[(Long, Long)].collect(), k).toSeq)
        .toDF("id", "core_deg")
    }
    var e = Components.symmetrize(norm, "src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var nNodes = e.select(col("src")).distinct().count()
    var iter = 0
    var done = nNodes == 0
    while (!done && iter < maxIter) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("keep_id"))
      val next = e
        .join(keep, e("src") === keep("keep_id"), "left_semi")
        .join(keep.select(col("keep_id").as("keep_dst")),
          e("dst") === col("keep_dst"), "left_semi")
        .localCheckpoint(eager = false)
      // ONE action per round: materializes the checkpoint AND counts
      // the surviving nodes for the convergence test
      val nextNodes = next.select(col("src")).distinct().count()
      e.unpersist(blocking = true)
      e = next
      done = nextNodes == nNodes || nextNodes == 0
      nNodes = nextNodes
      iter += 1
    }
    // the final frame stays materialized (checkpoint blocks back the
    // lazily-returned core — dropping them here would orphan it, and
    // the lineage is truncated so it could not recompute)
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("core_deg"))
  }

  /** Exact driver-side peel — semantics-for-semantics the distributed
    * loop's twin: symmetrize + dedup, then cascade-remove nodes whose
    * live degree drops below k (each removal decrements its
    * neighbors' sets, enqueueing any neighbor that just crossed the
    * threshold). Survivor degrees count only surviving neighbors —
    * exactly the distributed loop's final per-src edge count. The
    * k-core fixpoint is unique regardless of peel order, so the two
    * paths agree exactly. */
  private[operators] def kCoreLocal(rawEdges: Array[(Long, Long)], k: Int): Array[(Long, Long)] = {
    import scala.collection.mutable
    val nbrs = mutable.HashMap.empty[Long, mutable.HashSet[Long]]
    rawEdges.foreach { case (a, b) =>
      if (a != b) {
        nbrs.getOrElseUpdate(a, mutable.HashSet.empty) += b
        nbrs.getOrElseUpdate(b, mutable.HashSet.empty) += a
      }
    }
    val removed = mutable.HashSet.empty[Long]
    val queue = mutable.ArrayDeque.empty[Long]
    nbrs.foreach { case (u, s) => if (s.size < k) queue += u }
    while (queue.nonEmpty) {
      val u = queue.removeHead()
      if (!removed.contains(u)) {
        removed += u
        nbrs(u).foreach { v =>
          if (!removed.contains(v)) {
            val s = nbrs(v)
            s -= u
            if (s.size == k - 1) queue += v // just crossed below k
          }
        }
      }
    }
    nbrs.iterator
      .filter { case (u, s) => !removed.contains(u) && s.size >= k }
      .map { case (u, s) => (u, s.size.toLong) }
      .toArray
  }
}
