package graft.analytics

import graft.{SparkSpec, Tables}
import graft.operators.{KMeans, Similarity}
import org.apache.spark.sql.DataFrame

/** Pins the embedding-pair-graph dispatch decision (the sf10-measured
  * fix): under the banded vector budget the pair graph is the 32×4
  * seeded hyperplane family, above it the trained-IVF candidate path.
  * The limit is injected so both branches run on the same small corpus
  * and each is asserted equal to its path's direct output — a broken
  * dispatch (always-banded, always-IVF, inverted comparison) fails one
  * of the two equalities. */
class DataOpsDispatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("N <= limit dispatches to the banded 32x4 family") {
    val emb = Tables.embeddings(spark, dir)
    val got = DataOps.embPairGraphAdaptive(emb, dir) // 500 vectors, default budget 50k
    val banded = Similarity.nearDupPairs(emb, threshold = 0.4,
      bands = 32, planesPerBand = 4,
      planesOpt = Some(Similarity.gaussianPlanes(DataOps.lshSeed, 128, DataOps.embDim)))
    assert(pairSet(got) == pairSet(banded))
    assert(pairSet(got).nonEmpty)
  }

  test("lsh_pair_recall sampling dispatch: forced threshold slices to doc_id % 20 = 1") {
    import graft.operators.TextDedup
    import org.apache.spark.sql.functions.col
    val sampled = DataOps.lshPairRecall(spark, dir, sampleThreshold = 0L).head()
    val docsS = Tables.documents(spark, dir)
      .filter(col("doc_id") % DataOps.RecallSampleMod === 1)
    val nExact = TextDedup.jaccardPairsIndex(docsS, n = 3, threshold = 0.5).count()
    val nLsh = TextDedup.minhashLshPairs(docsS, n = 3, numHashes = 16, bands = 8,
      threshold = 0.5).count()
    assert(sampled.getAs[Long]("n_exact") == nExact)
    assert(sampled.getAs[Long]("n_lsh") == nLsh)
    // default threshold at this SF stays full-corpus (the oracle branch)
    val full = DataOps.lshPairRecall(spark, dir).head()
    val nExactFull = TextDedup.jaccardPairsIndex(Tables.documents(spark, dir),
      n = 3, threshold = 0.5).count()
    assert(full.getAs[Long]("n_exact") == nExactFull)
    assert(nExactFull > nExact, "the slice must actually shrink the exact leg")
  }

  test("dedup_jaccard_prefix sampling dispatch: forced threshold slices to doc_id % 20 = 1") {
    import graft.operators.TextDedup
    import org.apache.spark.sql.functions.col
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampled = pairs(DataOps.dedupJaccardPrefix(spark, dir, sampleThreshold = 0L))
    val docsS = Tables.documents(spark, dir)
      .filter(col("doc_id") % DataOps.RecallSampleMod === 1)
    val expected = pairs(TextDedup.jaccardPairs(docsS, n = 3, threshold = 0.5))
    assert(sampled == expected)
    // default threshold at this SF stays full-corpus (the oracle branch)
    val full = pairs(DataOps.dedupJaccardPrefix(spark, dir))
    val fullDirect = pairs(TextDedup.jaccardPairs(Tables.documents(spark, dir),
      n = 3, threshold = 0.5))
    assert(full == fullDirect)
    assert(sampled.subsetOf(full), "sampled pairs are a restriction of the full set")
    assert(full.size > sampled.size, "the slice must actually shrink the certification")
  }

  test("dedup_threshold_sweep sampling dispatch: forced threshold slices like lsh_pair_recall") {
    import graft.operators.TextDedup
    import org.apache.spark.sql.functions.{col, floor, lit, count, sum}
    val sampled = DataOps.dedupThresholdSweep(spark, dir, sampleThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val docsS = Tables.documents(spark, dir)
      .filter(col("doc_id") % DataOps.RecallSampleMod === 1)
    val expected = TextDedup.jaccardPairsIndex(docsS, n = 3, threshold = 0.1)
      .withColumn("bin", floor(col("jaccard") * 20).cast("long"))
      .withColumn("j4", floor(col("jaccard") * lit(1e4) + lit(0.5)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("j4")).as("sum_j4"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sampled == expected)
  }

  test("N > limit dispatches to the trained-IVF candidate path") {
    val emb = Tables.embeddings(spark, dir)
    val got = DataOps.embPairGraphAdaptive(emb, dir, bandedLimit = 10)
    val k = math.max(8, math.ceil(math.sqrt(emb.count().toDouble)).toInt)
    val ivf = Similarity.nearDupPairsIVF(emb, threshold = 0.4,
      KMeans.fit(emb, k, nIter = 2), nProbe = 2)
    assert(pairSet(got) == pairSet(ivf))
    assert(pairSet(got).nonEmpty)
  }
}
