package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFeaturesSpec extends SparkSpec {
  import spark.implicits._

  /** Scala replica of the portable char-fold (pins the kernel). */
  private def charFold(w: String): Long =
    w.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % TextDedup.P)

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("hashedTermDims: signed counts match a hand computation") {
    val d = docs(1L -> "aa bb aa", 2L -> "cc")
    val dim = 8
    def dimOf(w: String) = (charFold(w) % dim).toInt
    def signOf(w: String) = ((charFold(w) / dim) % 2 * 2 - 1).toInt
    val out = TextFeatures.hashedTermDims(d, dim)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => r._2 -> r._3).toMap }
    val exp1 = Seq("aa", "bb", "aa").groupBy(dimOf)
      .map { case (dm, ws) => dm -> ws.map(signOf(_).toLong).sum }
    assert(out(1L) == exp1)
    assert(out(2L) == Map(dimOf("cc") -> signOf("cc").toLong))
  }

  test("total signed mass is conserved: sum of counts == sum of token signs") {
    val d = docs(1L -> "x y z x q r s t u v w", 2L -> "m n o p")
    val dim = 4
    val total = TextFeatures.hashedTermDims(d, dim)
      .agg(sum($"cnt")).as[Long].head()
    val expected = Seq("x", "y", "z", "x", "q", "r", "s", "t", "u", "v", "w", "m", "n", "o", "p")
      .map(w => (charFold(w) / dim) % 2 * 2 - 1).sum
    assert(total == expected)
  }

  test("denseVectors assembles the exact dim-length float array, zeros for empty dims") {
    val d = docs(1L -> "aa bb")
    val dim = 8
    val sparse = TextFeatures.hashedTermDims(d, dim)
    val vec = TextFeatures.denseVectors(sparse, dim)
      .select($"features").as[Seq[Float]].head()
    assert(vec.length == dim)
    def dimOf(w: String) = (charFold(w) % dim).toInt
    def signOf(w: String) = ((charFold(w) / dim) % 2 * 2 - 1).toFloat
    val expect = Array.fill(dim)(0f)
    Seq("aa", "bb").foreach(w => expect(dimOf(w)) += signOf(w))
    assert(vec == expect.toSeq)
  }

  test("dense hashed vectors compose with the similarity operators") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta zeta",
      3L -> "completely different tokens here now")
    val vecs = TextFeatures.denseVectors(TextFeatures.hashedTermDims(d, 16), 16)
      .select($"doc_id".as("vec_id"), $"features".as("embedding"))
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), k = 2)
      .orderBy($"rank").as[(Long, Int, Long, Double)].collect()
    // doc 2 (4/5 shared tokens) must rank above the unrelated doc 3
    assert(top.head._3 == 2L)
  }
}
