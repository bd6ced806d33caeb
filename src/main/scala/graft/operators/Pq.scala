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

  /** Default subspace count for a dimensionality — the measured
    * m ∝ dim law (SCALE.md "Production-dimension embeddings": at
    * fixed m = 8, recall@5 collapses 0.62 → 0.42 → 0.24 as dims and
    * corpus grow; scaling m with dim recovers it — m = 32 at 256
    * dims lands 0.58 at sf0.1 where m = 8 lands 0.42). 8-dim
    * subvectors at any production dimensionality, never fewer than
    * the deployment-standard 8 subspaces, so a user at 768–1536 dims
    * gets the recall-preserving geometry by DEFAULT instead of
    * silent collapse at a stale fixed m. Clamped to dim for toy
    * corpora below 8 dims (1-dim subvectors); dim must be divisible
    * by the result — fitCodebooks' existing require fails loud on
    * geometries no m-law can fix (e.g. dim = 12). */
  def mForDim(dim: Int): Int = math.min(dim, math.max(8, dim / 8))

  /** [[fitCodebooks]] with the subspace count DERIVED from the
    * corpus's measured dimensionality via [[mForDim]] — the entry
    * point to prefer unless a specific compression ratio is the
    * point (explicit-m override stays available on the 6-arg form). */
  def fitCodebooksAuto(corpus: DataFrame, k: Int, nIter: Int,
      sampleN: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Code] = {
    val sample = collectSample(corpus, sampleN, idCol, vecCol)
    fitOnSample(sample, mForDim(sample.head.length), k, nIter)
  }

  private def collectSample(corpus: DataFrame, sampleN: Int,
      idCol: String, vecCol: String): Array[Array[Double]] = {
    val sample = corpus.orderBy(col(idCol).asc).limit(sampleN)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "fitCodebooks needs a non-empty corpus")
    sample
  }

  /** Train `m` codebooks of `k` centroids each with `nIter` Lloyd
    * iterations over the first `sampleN` corpus vectors (vec_id
    * order — the deterministic bounded sample). The collect is the
    * sample, not the corpus: PQ codebooks are universally trained on
    * a fixed-size subset (FAISS trains on ~100k of billions). */
  def fitCodebooks(corpus: DataFrame, m: Int, k: Int, nIter: Int,
      sampleN: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Code] = {
    require(k > 0 && nIter >= 0 && sampleN >= k,
      "fitCodebooks needs k > 0, nIter >= 0, sampleN >= k")
    fitOnSample(collectSample(corpus, sampleN, idCol, vecCol), m, k, nIter)
  }

  private def fitOnSample(sample: Array[Array[Double]], m: Int, k: Int,
      nIter: Int): Seq[Code] = {
    require(m > 0 && k > 0 && nIter >= 0,
      "fitCodebooks needs m > 0, k > 0, nIter >= 0")
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

  /** Flat literal arguments for the [[graft.functions.PqEncode]] /
    * [[graft.functions.PqReconFromCodes]] kernels: (subOffsets,
    * cellIds, coords, cc), cells ascending within each subspace (the
    * kernels' tie-to-lowest-cell contract). */
  private[graft] def bookArgs(books: Seq[Code])
      : (Seq[Int], Seq[Int], Seq[Seq[Double]], Seq[Double]) = {
    val m = books.map(_.sub).max + 1
    val bySub = (0 until m).map(s => books.filter(_.sub == s).sortBy(_.cell))
    require(bySub.forall(_.nonEmpty), "every subspace needs at least one cell")
    val flat = bySub.flatten
    val subOffsets = bySub.scanLeft(0)(_ + _.size)
    (subOffsets, flat.map(_.cell), flat.map(_.coords.toSeq), flat.map(_.cc))
  }

  /** Encode + reconstruct: (idCol, [keepCols,] codes, recon) where
    * recon is the concatenation of the assigned sub-centroids — the
    * vector ADC actually scores. One map-side pass through the
    * [[graft.functions.PqEncode]] kernel (the codebook rides as ONE
    * literal matrix, not an unrolled m·k expression tree — the
    * unrolled form blew janino's 64 KB method limit and pushed the
    * whole stage to interpreted eval; see PqCodec.scala). The codes
    * array is materialized in its own projection and recon derives
    * from it via the lookup-only [[graft.functions.PqReconFromCodes]]
    * kernel, so the argmin scoring runs ONCE per row. */
  def reconstruct(corpus: DataFrame, books: Seq[Code],
      idCol: String = "vec_id", vecCol: String = "embedding",
      keepCols: Seq[String] = Nil): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    require(books.nonEmpty, "reconstruct needs trained codebooks")
    val (subOffsets, cellIds, coords, cc) = bookArgs(books)
    val v = col(vecCol)
    val kept = keepCols.map(col)
    val coded = corpus.select(col(idCol) +: kept :+ v :+
      GraftFunctions.pqEncode(v, subOffsets, cellIds, coords, cc).as("codes"): _*)
    coded.select(col(idCol) +: kept :+ v :+ col("codes") :+
      GraftFunctions.pqRecon(col("codes"), subOffsets, cellIds, coords).as("recon"): _*)
  }

  /** ADC top-k: exact queries against the reconstructed corpus —
    * same broadcast-query / corpus-never-shuffles shape as
    * [[Similarity.bruteForceTopK]], cosine on the 1e-6 grid, ties to
    * the lowest neighbor id. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, books: Seq[Code], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms hoisted OUT of the pair loop: ‖recon‖ once per corpus row,
    // ‖q‖ once per query — the per-pair expression is one dot + one
    // divide (same values, same fold order, so the oracle holds)
    val rec = reconstruct(corpus, books, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("recon"),
        sqrt(GraftFunctions.dot(col("recon"), col("recon"))).as("r_norm"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", sqrt(GraftFunctions.dot(col("q_vec"), col("q_vec"))))
    val cos = GraftFunctions.dot(col("q_vec"), col("recon")) /
      (col("q_norm") * col("r_norm"))
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
      .select(col(idCol).as("neighbor_id"), col("cell"), col("recon"),
        sqrt(GraftFunctions.dot(col("recon"), col("recon"))).as("r_norm"))
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
      .select(col("query_id"), col("q_vec"), (-col("sc.negcell")).as("cell"),
        sqrt(GraftFunctions.dot(col("q_vec"), col("q_vec"))).as("q_norm"))
    val cos = GraftFunctions.dot(col("q_vec"), col("recon")) /
      (col("q_norm") * col("r_norm"))
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
