package graft

import org.apache.spark.sql.functions._

/** Red-tests for the scale-rehearsal generator's mutation rules.
  *
  * The rehearsal's honesty depends on cross-copy content being
  * DISSIMILAR by construction — a collision between two copies' name
  * prefixes or embedding transforms would let candidate generators
  * (fuzzy blocking, LSH bands, IVF cells) find cross-copy "duplicates"
  * that real scaled data would not have, inflating pair volume
  * quadratically and poisoning the measured growth curve. These specs
  * pin the collision-freedom over the FULL supported range
  * (copies = 100, the sf10 rehearsal), not just the 10 copies the sf1
  * run used.
  */
class ScaleUpSpec extends SparkSpec {

  private def editDistance(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("name prefixes keep every cross-copy pair at edit distance >= 2 over 100 copies") {
    // The deletion-neighborhood linkage links names at distance <= 1;
    // any prefix pair closer than 2 would create cross-copy candidate
    // pairs for EVERY base name — the quadratic artifact the rule
    // exists to prevent.
    val base = "Customer#000000042"
    val names = (0 until 100).map(c => ScaleUp.namePrefix(c) + base)
    assert(names.distinct.size == 100)
    for (i <- 0 until 100; j <- (i + 1) until 100) {
      val d = editDistance(names(i), names(j))
      assert(d >= 2, s"copies $i and $j: edit distance $d < 2")
    }
  }

  test("embedding transforms are pairwise distinct and cross-copy cosine is noise-level") {
    import spark.implicits._
    // One deterministic unit-ish base vector; apply all 100 copy
    // transforms and check (a) all images distinct, (b) every
    // cross-copy cosine is far below the 0.4 near-dup threshold the
    // dedup entries use. A lag or sign collision would put one pair at
    // cosine 1.0 exactly.
    val rnd = new scala.util.Random(7)
    val baseVec = Array.fill(64)((rnd.nextGaussian() / 8.0).toFloat)
    val one = Seq(Tuple1(baseVec)).toDF("embedding")
    val images: Seq[Array[Float]] = (0 until 100).map { c =>
      one.select(ScaleUp.embedMutation(c, col("embedding")).as("e"))
        .head().getSeq[Float](0).toArray
    }
    assert(images.map(_.toSeq).distinct.size == 100, "two copies share a transform image")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    // Norm preservation: rotation + sign flips are isometries.
    val n0 = math.sqrt(images(0).map(x => x * x).sum)
    images.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - n0) < 1e-4)
    }
    for (i <- 0 until 100; j <- (i + 1) until 100) {
      val c = math.abs(cos(images(i), images(j)))
      assert(c < 0.4, s"copies $i and $j: |cosine| $c >= 0.4 — transform collision")
    }
  }

  test("scale(copies = 3) preserves referential integrity and per-copy shapes") {
    val src = "/root/testdata/sf0.001"
    val dst = java.nio.file.Files.createTempDirectory("graft-scaleup").toString
    ScaleUp.scale(spark, src, dst, copies = 3)
    val ord = spark.read.parquet(s"$dst/orders.parquet")
    val cust = spark.read.parquet(s"$dst/customer.parquet")
    val baseOrd = Tables.orders(spark, src).count()
    val baseCust = Tables.customer(spark, src).count()
    assert(ord.count() == 3 * baseOrd)
    assert(cust.count() == 3 * baseCust)
    // Every order's customer exists (referential integrity holds across shifts).
    val orphans = ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti").count()
    assert(orphans == 0L)
    // Key cardinality scales exactly — no key collisions between copies.
    assert(cust.select("c_custkey").distinct.count() == 3 * baseCust)
    // Documents: cross-copy token vocabularies are disjoint (suffix remap).
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val dStr = Tables.documents(spark, src).agg(max(col("doc_id"))).head().getLong(0) + 1L
    val tok = docs.withColumn("copy", (col("doc_id") / dStr).cast("int"))
      .select(col("copy"), explode(split(col("text"), " ")).as("w"))
    val shared = tok.filter(col("copy") === 0).select("w").distinct
      .join(tok.filter(col("copy") === 1).select("w").distinct, "w").count()
    assert(shared == 0L, s"$shared tokens shared between copy 0 and copy 1")
  }
}
