package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank (power iteration) over an undirected pair
  * graph — the centrality signal web-curation pipelines attach to the
  * duplicate/similarity graph: a document whose near-dup neighborhood
  * is large and well-connected is template/boilerplate-shaped, and
  * ranking members makes the hubs explicit (the same role host-level
  * PageRank plays in CommonCrawl-style corpus filtering).
  *
  * Each iteration is one equi-join (ranks onto edges) + one
  * partial-aggregable sum per destination — shuffle-partitionable,
  * no driver-side graph required. The edge-with-degree frame is
  * loop-invariant and cached once; the rank vector (n × 16 bytes) is
  * BROADCAST to it while it fits, so an iteration costs exactly one
  * exchange (the per-dst sum) — co-partitioning a 100 TB edge list
  * every round is the textbook distributed-PageRank bottleneck.
  *
  * Adaptive execution (the [[Components.connectedComponents]]
  * pattern — pick the strategy from a measured statistic, not a
  * guess): the normalized edge count is read with one bounded
  * limit-probe; at or under `driverEdgeLimit` edges the power
  * iteration runs exactly on the driver ([[powerIterationLocal]] — a
  * bounded fetch, like a broadcast join's build side, and zero
  * per-round job-scheduling latency), above it the distributed loop
  * runs. Both paths execute the identical quantized arithmetic and
  * are BIT-equal (pinned in PageRankSpec with `driverEdgeLimit = 0`).
  *
  * Determinism and oracle replayability: each edge contribution
  * `rank/degree` is quantized to the 1e-12 grid BEFORE summation, so
  * per-destination sums are exact int64 arithmetic — identical on any
  * partitioning, executor count, engine, or dispatch path; the DuckDB
  * oracle unrolls the same iterations as CTE blocks. On the symmetric
  * graph every node has in-degree ≥ 1, so there is no dangling-mass
  * term. */
object PageRank {

  /** Edge budget for the exact driver path — the same bound class as
    * [[Components.DriverEdgeLimit]]: 2M edges ≈ 32 MB of (long, long),
    * comfortably a broadcast-build-side-sized fetch. */
  val DriverEdgeLimit: Long = 1L << 21

  /** (id, rank) after `nIter` iterations with the standard damping
    * scheme: rank' = (1-d)/N + d·Σ_in quantize(rank/deg). Nodes are
    * exactly those appearing in an edge (singletons carry no signal
    * here); self-loops ignored. `driverEdgeLimit = 0` forces the
    * distributed loop (used by specs to pin path equivalence). */
  def ranks(edges: DataFrame, src: String = "src", dst: String = "dst",
      nIter: Int = 3, damping: Double = 0.85,
      driverEdgeLimit: Long = DriverEdgeLimit): DataFrame = {
    require(nIter >= 0 && damping >= 0 && damping <= 1, "pagerank needs 0<=d<=1, nIter>=0")
    val spark = edges.sparkSession
    val e = edges.select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .filter(col("src") =!= col("dst") && col("src").isNotNull && col("dst").isNotNull)
    if (driverEdgeLimit > 0 && e.limit((driverEdgeLimit + 1).toInt).count() <= driverEdgeLimit) {
      import spark.implicits._
      val local = powerIterationLocal(e.as[(Long, Long)].collect(), nIter, damping)
      if (local.isEmpty)
        emptyRanks(edges)
      else spark.createDataset(local.toSeq).toDF("id", "rank")
    } else distributedRanks(e, nIter, damping)
  }

  private def emptyRanks(edges: DataFrame): DataFrame =
    edges.sparkSession.emptyDataFrame
      .withColumn("id", lit(0L)).withColumn("rank", lit(0.0)).limit(0)

  /** Exact driver-side power iteration — arithmetic-for-arithmetic the
    * distributed loop's twin: symmetrize + dedup, per-node degree,
    * uniform 1/n seed, then per round quantize each contribution
    * `floor(rank/deg · 1e12 + 0.5)` to int64, sum per destination, and
    * damp. Every float op mirrors the Column expression exactly
    * (IEEE double division → multiply → add → floor; int64 sums are
    * order-free), so the two paths are bit-equal, not approximately
    * equal. */
  private[operators] def powerIterationLocal(rawEdges: Array[(Long, Long)],
      nIter: Int, damping: Double): Array[(Long, Double)] = {
    // symmetrize + distinct, drop self-loops (pre-filtered, but keep
    // the guard so the kernel is safe standalone)
    val sym = rawEdges.iterator
      .filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .toSet
    if (sym.isEmpty) return Array.empty
    val nodes = sym.iterator.map(_._1).toArray.distinct.sorted
    val n = nodes.length
    val idx = nodes.zipWithIndex.toMap
    val srcIdx = new Array[Int](sym.size)
    val dstIdx = new Array[Int](sym.size)
    val deg = new Array[Long](n)
    var k = 0
    sym.foreach { case (a, b) =>
      srcIdx(k) = idx(a); dstIdx(k) = idx(b); deg(idx(a)) += 1L; k += 1
    }
    val teleport = 1.0 - damping
    var rank = Array.fill(n)(1.0 / n)
    var it = 0
    while (it < nIter) {
      val sq = new Array[Long](n)
      var i = 0
      while (i < srcIdx.length) {
        // mirror of floor(rank / deg * 1e12 + 0.5) cast long
        sq(dstIdx(i)) += math.floor(rank(srcIdx(i)) / deg(srcIdx(i)).toDouble * 1e12 + 0.5).toLong
        i += 1
      }
      // mirror of lit(teleport)/lit(n) + lit(damping)*(sq/1e12)
      rank = Array.tabulate(n)(j => teleport / n.toDouble + damping * (sq(j).toDouble / 1e12))
      it += 1
    }
    nodes.zip(rank)
  }

  private def distributedRanks(e: DataFrame, nIter: Int, damping: Double): DataFrame = {
    val sym = Components.symmetrize(e, "src", "dst")
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // loop-invariant: every iteration joins ranks onto the SAME
    // edge-with-degree frame — compute and cache it once
    val symDeg = sym.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.select(countDistinct(col("src"))).head().getLong(0)
    if (n == 0) {
      symDeg.unpersist(blocking = true)
      return emptyRanks(e)
    }
    // both constants are evaluated once here and mirrored into the
    // oracle as full-precision double strings, so engine and oracle
    // run bit-identical scalar arithmetic
    val teleport = 1.0 - damping
    // rank vector ≤ ~32 MB ⇒ broadcast it so the cached edge frame is
    // never reshuffled; above that, shuffle join is the only correct
    // choice (and the cache still pins the edge partitioning)
    val bcastRanks = n <= 2000000L
    def joinRanks(r: DataFrame): DataFrame = {
      val rhs = r.select(col("id").as("src"), col("rank"))
      symDeg.join(if (bcastRanks) broadcast(rhs) else rhs, "src")
    }
    var ranks = symDeg.select(col("src").as("id")).distinct()
      .withColumn("rank", lit(1.0 / n))
    // Lineage policy: an eager localCheckpoint EVERY round (the r6
    // form) costs one extra materialization + job-scheduling round
    // trip per iteration — at the catalog's nIter=3 that tripled
    // wall time vs letting the 3-join DAG execute as one job. Depth-3
    // lineage is trivially plannable, so truncate only every third
    // round: long runs keep flat plans and O(1) block-manager state,
    // short runs pay zero intermediate materializations. Results are
    // bit-identical either way (the quantized-grid arithmetic does
    // not depend on where lineage is cut).
    var lastCkpt: Option[DataFrame] = None
    var i = 0
    while (i < nIter) {
      var next = joinRanks(ranks)
        .select(col("dst"),
          floor(col("rank") / col("deg") * 1e12 + lit(0.5)).cast("long").as("q"))
        .groupBy(col("dst"))
        .agg(sum(col("q")).as("sq"))
        .select(col("dst").as("id"),
          (lit(teleport) / lit(n.toDouble) +
            lit(damping) * (col("sq").cast("double") / 1e12)).as("rank"))
      if ((i + 1) % 3 == 0 && i + 1 < nIter) {
        next = next.localCheckpoint()
        lastCkpt.foreach(_.unpersist(blocking = true))
        lastCkpt = Some(next)
      }
      ranks = next
      i += 1
    }
    // one eager materialization of the FINAL ranks (not one per round)
    // so symDeg's cache is live while the DAG executes and can then be
    // released — and so callers re-reading the result don't replay the
    // whole power iteration
    val out = ranks.localCheckpoint()
    lastCkpt.foreach(_.unpersist(blocking = true))
    symDeg.unpersist(blocking = true)
    out
  }
}
