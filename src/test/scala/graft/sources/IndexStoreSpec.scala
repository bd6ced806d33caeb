package graft.sources

import graft.{SparkSpec, Tables}
import graft.operators.{KMeans, Pq}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The artifact round trip must be EXACT — a trained index loaded in
  * another job has to search identically to the one that trained it,
  * or offline training is not trustworthy. Pinned at the strongest
  * level available: bit-equal parameters AND identical downstream
  * results (assignments / ADC rankings) through the loaded copies. */
class IndexStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("centroids round-trip bit-for-bit and assign identically") {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = KMeans.fit(emb, k = 8, nIter = 2)
    val path = Files.createTempDirectory("idxstore").toString + "/cents"
    IndexStore.saveCentroids(spark, cents, path)
    val loaded = IndexStore.loadCentroids(spark, path)
    assert(loaded.map(_._1) == cents.map(_._1).sorted)
    val byCell = cents.toMap
    loaded.foreach { case (c, v) =>
      assert(java.util.Arrays.equals(v, byCell(c)), s"cell $c coords drifted")
    }
    def rollup(cs: Seq[(Int, Array[Double])]) =
      KMeans.assignCells(emb, cs)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"), sum(col("vec_id")).as("s"))
        .orderBy(col("cell").asc)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rollup(loaded) == rollup(cents))
  }

  test("PQ codebooks round-trip bit-for-bit and rank identically through ADC") {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val books = Pq.fitCodebooks(emb, m = 8, k = 16, nIter = 2, sampleN = 128)
    val path = Files.createTempDirectory("idxstore").toString + "/books"
    IndexStore.savePqCodebooks(spark, books, path)
    val loaded = IndexStore.loadPqCodebooks(spark, path)
    assert(loaded.size == books.size)
    val byKey = books.map(b => (b.sub, b.cell) -> b).toMap
    loaded.foreach { b =>
      val orig = byKey((b.sub, b.cell))
      assert(java.util.Arrays.equals(b.coords, orig.coords), s"(${b.sub},${b.cell}) coords drifted")
      assert(b.cc == orig.cc, s"(${b.sub},${b.cell}) cc drifted")
    }
    def topk(bs: Seq[Pq.Code]) =
      Pq.adcTopK(emb, emb.filter(col("vec_id") < 5), bs, k = 3)
        .collect().map(_.toSeq).toSeq
    assert(topk(loaded) == topk(books))
  }
}
