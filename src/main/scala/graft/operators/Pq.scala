package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Product quantization (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") — the memory-side
  * companion to the IVF probe index: split each vector into `m`
  * subspaces, learn a small k-means codebook per subspace on a
  * BOUNDED training sample, and replace every corpus vector with `m`
  * one-byte codes. Search scores queries against the RECONSTRUCTED
  * corpus (asymmetric distance computation — the query stays exact,
  * only the corpus side is quantized), so a 64-dim float corpus
  * compresses 64× while top-k stays approximately rank-preserving.
  *
  * Scale shape (the FAISS deployment recipe): codebooks train on a
  * fixed-size sample (`sampleN` vectors — a bounded driver fetch,
  * like [[KMeans.initCentroids]]'s k rows), then ENCODE and SEARCH
  * are map-side passes with the codebooks as plan literals — the
  * corpus never shuffles, and at 100 TB the 16-byte codes are what
  * an executor keeps hot, not the raw floats.
  *
  * Determinism mirrors [[KMeans]]: init = first k sample subvectors
  * in vec_id order; L2 assignment via score = dot(c,c) − 2·dot(v,c)
  * (the shared dot(v,v) term cancels in the argmin) with ties to the
  * lowest cell; mean updates on the 1e-9 integer grid (exact int64
  * sums ⇒ order-independent). Every double op has a fixed
  * association order, so the DuckDB oracle replays training, encode,
  * reconstruction and search bit-for-bit.
  */
object Pq {

  /** One trained codebook entry: subspace, cell id, centroid
    * coordinates, and the precomputed dot(c, c) in the kernel's
    * left-to-right fold order. */
  final case class Code(sub: Int, cell: Int, coords: Array[Double], cc: Double)

  private def dotLR(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Train `m` codebooks of `k` centroids each with `nIter` Lloyd
    * iterations over the first `sampleN` corpus vectors (vec_id
    * order — the deterministic bounded sample). The collect is the
    * sample, not the corpus: PQ codebooks are universally trained on
    * a fixed-size subset (FAISS trains on ~100k of billions). */
  def fitCodebooks(corpus: DataFrame, m: Int, k: Int, nIter: Int,
      sampleN: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Code] = {
    require(m > 0 && k > 0 && nIter >= 0 && sampleN >= k,
      "fitCodebooks needs m > 0, k > 0, nIter >= 0, sampleN >= k")
    val sample = corpus.orderBy(col(idCol).asc).limit(sampleN)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "fitCodebooks needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    (0 until m).flatMap { s =>
      val sv = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      // init: first k subvectors, cells 0..k-1
      var cents: Seq[(Int, Array[Double])] =
        sv.take(k).zipWithIndex.map { case (c, i) => i -> c }.toSeq
      var it = 0
      while (it < nIter) {
        // assign each sample subvector to argmin_{cell} cc - 2*dot(v,c)
        val assigned = sv.map { v =>
          var bestCell = -1; var bestScore = Double.MaxValue
          cents.foreach { case (cell, c) =>
            val score = dotLR(c, c) - 2.0 * dotLR(v, c)
            if (score < bestScore || (score == bestScore && cell < bestCell)) {
              bestScore = score; bestCell = cell
            }
          }
          bestCell -> v
        }
        // 1e-9-grid quantized per-cell means; empty cells disappear
        cents = assigned.groupBy(_._1).toSeq.sortBy(_._1).map { case (cell, vs) =>
          val n = vs.length.toLong
          val coords = Array.tabulate(subDim) { d =>
            var sq = 0L
            vs.foreach { case (_, v) => sq += math.floor(v(d) * 1e9 + 0.5).toLong }
            (sq.toDouble / n) / 1e9
          }
          cell -> coords
        }
        it += 1
      }
      cents.map { case (cell, c) => Code(s, cell, c, dotLR(c, c)) }
    }
  }

  private def subSlice(v: Column, sub: Int, subDim: Int): Column =
    slice(v, sub * subDim + 1, subDim)

  /** Per-row code assignment for subspace `sub`: argmin over that
    * subspace's codebook of dot(c,c) − 2·dot(v_s, c), ties to the
    * lowest cell — the array_min-over-structs form (struct ordering
    * is field order, so min score wins and min cell breaks ties).
    * Map-side only: centroids are plan literals. */
  private def codeCol(v: Column, sub: Int, subDim: Int, book: Seq[Code]): Column = {
    val sv = subSlice(v, sub, subDim)
    val scored = book.filter(_.sub == sub).map { cd =>
      val score = lit(cd.cc) - lit(2.0) * GraftFunctions.dot(sv, typedlit(cd.coords.toSeq))
      struct(score.as("score"), lit(cd.cell).as("cell"))
    }
    array_min(array(scored: _*)).getField("cell")
  }

  /** Encode + reconstruct: (idCol, [keepCols,] codes, recon) where
    * recon is the concatenation of the assigned sub-centroids — the
    * vector ADC actually scores. One map-side pass, codebooks as
    * literal maps. The codes array is materialized in its own
    * projection and recon derives from it via element_at, so the
    * per-subspace argmin scoring runs ONCE per row (CollapseProject
    * keeps the split: the codes alias is non-cheap and multiply
    * referenced). */
  def reconstruct(corpus: DataFrame, books: Seq[Code],
      idCol: String = "vec_id", vecCol: String = "embedding",
      keepCols: Seq[String] = Nil): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    require(books.nonEmpty, "reconstruct needs trained codebooks")
    val m = books.map(_.sub).max + 1
    val subDim = books.head.coords.length
    val v = col(vecCol)
    val kept = keepCols.map(col)
    val coded = corpus.select(col(idCol) +: kept :+ v :+
      array((0 until m).map(s => codeCol(v, s, subDim, books)): _*).as("codes"): _*)
    val parts = (0 until m).map { s =>
      val lut = typedlit(books.filter(_.sub == s)
        .map(cd => cd.cell -> cd.coords.toSeq).toMap)
      element_at(lut, element_at(col("codes"), s + 1).cast("int"))
    }
    coded.select(col(idCol) +: kept :+ v :+ col("codes") :+
      flatten(array(parts: _*)).as("recon"): _*)
  }

  /** ADC top-k: exact queries against the reconstructed corpus —
    * same broadcast-query / corpus-never-shuffles shape as
    * [[Similarity.bruteForceTopK]], cosine on the 1e-6 grid, ties to
    * the lowest neighbor id. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, books: Seq[Code], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rec = reconstruct(corpus, books, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("recon"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val cos = GraftFunctions.dot(col("q_vec"), col("recon")) /
      (sqrt(GraftFunctions.dot(col("q_vec"), col("q_vec"))) *
        sqrt(GraftFunctions.dot(col("recon"), col("recon"))))
    val scored = rec.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", floor(cos * lit(1e6) + lit(0.5)) / lit(1e6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVFADC (Jégou et al. 2011 §V): the trained-IVF probe index
    * composed with PQ codes — the genuine 100 TB ANN recipe. The
    * corpus is coarse-assigned to centroid cells ([[KMeans
    * .assignCells]]) and PQ-encoded, both map-side with literal
    * parameters; each query probes its `nProbe` nearest cells (same
    * struct-sort probe as [[Similarity.ivfTopKTrained]]) and
    * ADC-scores ONLY the probed cells' reconstructions — candidate
    * volume is Σ probed-cell occupancy, never N, and the 2-byte codes
    * are what stays hot while the raw floats stay cold. The cell join
    * is an equi-join with the O(queries·nProbe) side broadcast. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[(Int, Array[Double])], books: Seq[Code], k: Int,
      nProbe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    require(centroids.nonEmpty && nProbe > 0, "ivfAdcTopK needs centroids and nProbe > 0")
    val rec = reconstruct(KMeans.assignCells(corpus, centroids, idCol, vecCol),
        books, idCol, vecCol, keepCols = Seq("cell"))
      .select(col(idCol).as("neighbor_id"), col("cell"), col("recon"))
    val v = col(vecCol)
    // query-side probe: max cosine first, ties to the LOWEST cell id
    // (struct sort on (cos, -cell) — same total order as assignCells)
    val scoredCells = array(centroids.map { case (cid, c) =>
      val cl = typedlit(c.toSeq)
      struct((GraftFunctions.dot(v, cl) /
          (sqrt(GraftFunctions.dot(v, v)) * sqrt(GraftFunctions.dot(cl, cl)))).as("cos"),
        lit(-cid).as("negcell"))
    }: _*)
    val qB = queries.select(col(idCol).as("query_id"), v.as("q_vec"),
        explode(slice(sort_array(scoredCells, asc = false), 1, nProbe)).as("sc"))
      .select(col("query_id"), col("q_vec"), (-col("sc.negcell")).as("cell"))
    val cos = GraftFunctions.dot(col("q_vec"), col("recon")) /
      (sqrt(GraftFunctions.dot(col("q_vec"), col("q_vec"))) *
        sqrt(GraftFunctions.dot(col("recon"), col("recon"))))
    val scored = rec.join(broadcast(qB), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", floor(cos * lit(1e6) + lit(0.5)) / lit(1e6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
