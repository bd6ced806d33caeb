package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.GraftFunctions

/** Distributed Lloyd's k-means over embedding columns — the centroid
  * trainer for the IVF similarity index ([[Similarity.ivfTopK]] uses
  * "first k vectors" as seed cells; real layouts want centroids that
  * track data density).
  *
  * Scale shape per iteration:
  *  - ASSIGN is a pure map-side projection: the k centroids ride in
  *    the plan as literal arrays, each scored with the codegen'd
  *    `graft_dot` kernel and reduced with an array-of-structs argmax —
  *    no join, no shuffle, no window. The corpus is read once per
  *    iteration and never reshuffled.
  *  - UPDATE is one partial-aggregable groupBy on (cell, dim) over
  *    posexploded coordinates, then a k·dim-bounded collect — a
  *    PARAMETER fetch (same class as broadcasting ML weights), not a
  *    data-dependent collect.
  *
  * Determinism (and oracle replayability): assignment ties break to
  * the lowest cell id; coordinate sums quantize each value to 1e-9 on
  * the grid (exact int64 arithmetic) so the per-cell means are
  * order-independent — identical on 1 or 1000 executors and in the
  * DuckDB oracle, which unrolls the same iterations as CTEs. Empty
  * cells are dropped (k may shrink); re-seed explicitly if a stable k
  * matters. Cosine assignment assumes no zero vectors.
  */
object KMeans {

  /** Deterministic seed: the first k vectors in id order, as
    * (cellId, coords) pairs with cellId = rank 0..k-1. */
  def initCentroids(corpus: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Int, Array[Double])] =
    corpus.orderBy(col(idCol).asc).limit(k).select(col(vecCol)).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](0).map(_.toDouble).toArray }.toSeq

  /** Each row tagged with its nearest (max cosine) centroid:
    * (idCol, vecCol, cell, cell_cos). Ties: lowest cell id. Map-side
    * only — centroids are literals, argmax is an array_max over
    * (cos, -cell) structs (struct ordering = field order, so max cos
    * wins and max -cell = min cell breaks ties). */
  def assignCells(df: DataFrame, centroids: Seq[(Int, Array[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    require(centroids.nonEmpty, "assignCells needs at least one centroid")
    val v = col(vecCol)
    val vNorm = sqrt(GraftFunctions.dot(v, v))
    val scored = centroids.map { case (cid, c) =>
      val cl = typedLit(c.toSeq)
      // constant subexpression sqrt(dot(cl, cl)) folds at plan time;
      // same fold order as the oracle's sqrt(dot(c, c))
      val cos = GraftFunctions.dot(v, cl) / (vNorm * sqrt(GraftFunctions.dot(cl, cl)))
      struct(cos.as("cos"), lit(-cid).as("negcell"))
    }
    val best = array_max(array(scored: _*))
    df.select(col(idCol), v,
      (-best.getField("negcell")).as("cell"),
      best.getField("cos").as("cell_cos"))
  }

  /** One mean update from an assigned frame: per-cell, per-dimension
    * mean over values quantized to the 1e-9 grid (exact int64 sums ⇒
    * order-independent means). Cells with no members disappear. */
  def meanUpdate(assigned: DataFrame, vecCol: String = "embedding"): Seq[(Int, Array[Double])] = {
    val dims = assigned.select(col("cell"), posexplode(col(vecCol)))
      .select(col("cell"), col("pos"),
        floor(col("col").cast("double") * 1e9 + lit(0.5)).cast("long").as("q"))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .collect()
    dims.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (cell, rows) =>
      val coords = rows.sortBy(_.getInt(1))
        .map(r => (r.getLong(2).toDouble / r.getLong(3)) / 1e9).toArray
      cell -> coords
    }
  }

  /** The fit-loop assign: cell only, via the fused
    * `graft_top_cells(v, cells, matrix, 1)` kernel — the SAME
    * assignment as [[assignCells]] (TopCellsSpec pins the parity) but
    * with one literal centroid matrix instead of k array-literal plan
    * nodes, so re-planning every Lloyd iteration stays O(1) in k. */
  private def assignCellsLean(df: DataFrame, centroids: Seq[(Int, Array[Double])],
      vecCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(vecCol),
      element_at(GraftFunctions.topCells(col(vecCol), centroids, 1), 1).as("cell"))
  }

  /** `nIter` Lloyd iterations from the deterministic seed; returns the
    * final (cellId, coords) centroids. The corpus projection is cached
    * across iterations and released on exit. */
  def fit(corpus: DataFrame, k: Int, nIter: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Int, Array[Double])] = {
    require(k > 0 && nIter >= 0, "fit needs k > 0 and nIter >= 0")
    val cached = corpus.select(col(idCol), col(vecCol)).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var cents = initCentroids(cached, k, idCol, vecCol)
      var i = 0
      while (i < nIter) {
        cents = meanUpdate(assignCellsLean(cached, cents, vecCol), vecCol)
        i += 1
      }
      cents
    } finally cached.unpersist(blocking = false)
  }
}
