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
  * no driver-side graph. Per-round frames are localCheckpoint-ed and
  * released exactly like [[Components]] (plans stay flat, block
  * manager stays O(1) in rounds).
  *
  * Determinism and oracle replayability: each edge contribution
  * `rank/degree` is quantized to the 1e-12 grid BEFORE summation, so
  * per-destination sums are exact int64 arithmetic — identical on any
  * partitioning, executor count, or engine; the DuckDB oracle unrolls
  * the same iterations as CTE blocks. On the symmetric graph every
  * node has in-degree ≥ 1, so there is no dangling-mass term. */
object PageRank {

  /** (id, rank) after `nIter` iterations with the standard damping
    * scheme: rank' = (1-d)/N + d·Σ_in quantize(rank/deg). Nodes are
    * exactly those appearing in an edge (singletons carry no signal
    * here); self-loops ignored. */
  def ranks(edges: DataFrame, src: String = "src", dst: String = "dst",
      nIter: Int = 3, damping: Double = 0.85): DataFrame = {
    require(nIter >= 0 && damping >= 0 && damping <= 1, "pagerank needs 0<=d<=1, nIter>=0")
    val sym = Components.symmetrize(edges, src, dst)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // loop-invariant: every iteration joins ranks onto the SAME
    // edge-with-degree frame — compute and cache it once
    val symDeg = sym.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.select(countDistinct(col("src"))).head().getLong(0)
    if (n == 0) {
      symDeg.unpersist(blocking = true)
      return edges.sparkSession.emptyDataFrame
        .withColumn("id", lit(0L)).withColumn("rank", lit(0.0)).limit(0)
    }
    // both constants are evaluated once here and mirrored into the
    // oracle as full-precision double strings, so engine and oracle
    // run bit-identical scalar arithmetic
    val teleport = 1.0 - damping
    var ranks = symDeg.select(col("src").as("id")).distinct()
      .withColumn("rank", lit(1.0 / n)).localCheckpoint()
    var i = 0
    while (i < nIter) {
      val next = symDeg
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .select(col("dst"),
          floor(col("rank") / col("deg") * 1e12 + lit(0.5)).cast("long").as("q"))
        .groupBy(col("dst"))
        .agg(sum(col("q")).as("sq"))
        .select(col("dst").as("id"),
          (lit(teleport) / lit(n.toDouble) +
            lit(damping) * (col("sq").cast("double") / 1e12)).as("rank"))
        .localCheckpoint()
      ranks.unpersist(blocking = true)
      ranks = next
      i += 1
    }
    symDeg.unpersist(blocking = true)
    ranks
  }
}
