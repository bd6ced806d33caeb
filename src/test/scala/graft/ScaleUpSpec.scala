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
  * (copies = 1008 — one decade past the sf10 rehearsal; the sf100
  * probe uses 1000), not just the 10 copies the sf1 run used.
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

  test("name prefixes keep every cross-copy pair at edit distance >= 2 over MaxCopies copies") {
    // The deletion-neighborhood linkage links names at distance <= 1;
    // any prefix pair closer than 2 would create cross-copy candidate
    // pairs for EVERY base name — the quadratic artifact the rule
    // exists to prevent. Sweeps the FULL require()-allowed range: for
    // c >= 1000 the h digit renders as "1010" (no longer a doubled
    // single digit), so copies 1000..1007 need the sweep, not the
    // doubled-digit length argument.
    val n = ScaleUp.MaxCopies
    val base = "Customer#000000042"
    val names = (0 until n).map(c => ScaleUp.namePrefix(c) + base)
    assert(names.distinct.size == n)
    for (i <- 0 until n; j <- (i + 1) until n) {
      val d = editDistance(names(i), names(j))
      assert(d >= 2, s"copies $i and $j: edit distance $d < 2")
    }
  }

  test("embedding transforms are pairwise distinct and cross-copy cosine is noise-level over 1008 copies") {
    // One deterministic unit-ish base vector; apply all 1008 copy
    // transforms (via the local mirror — the Column path is pinned
    // against it below) and check (a) all images distinct, (b) every
    // cross-copy cosine stays noise-level. A lag or sign collision
    // would put one pair at cosine 1.0 exactly. A circular shift of a
    // 64-dim Gaussian probe has autocorrelation ~N(0, 1/64) (sd
    // 0.125), so over the 507,528 pairs a >0.4 (3.2 sd) tail is
    // structurally unavoidable for ANY probe vector. For THIS seed-7
    // probe the tail is ONE relative-transform equivalence class:
    // 240 pairs (0.047%), every one at the identical cosine 0.41344
    // (pair (i,j) has it iff transform(j)∘transform(i)⁻¹ equals the
    // one relative shift+mask whose autocorrelation crosses 0.4) — a
    // hair over the 0.4 near-dup threshold the dedup entries use.
    // The class is pinned EXACTLY (count + shared cosine + canonical
    // member) so any second class or growth fails the suite, and
    // everything must stay under 0.45 — a real collision lands at
    // 1.0, three orders of magnitude past the bound. The structural
    // half-the-coordinates guarantee is the next test.
    val n = ScaleUp.MaxCopies
    val rnd = new scala.util.Random(7)
    val baseVec = Array.fill(64)((rnd.nextGaussian() / 8.0).toFloat)
    val images: IndexedSeq[Array[Float]] =
      (0 until n).map(c => ScaleUp.embedMutationLocal(c, baseVec))
    assert(images.map(_.toSeq).distinct.size == n, "two copies share a transform image")
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
    val overThreshold = scala.collection.mutable.ArrayBuffer[(Int, Int, Double)]()
    for (i <- 0 until n; j <- (i + 1) until n) {
      val c = math.abs(cos(images(i), images(j)))
      assert(c < 0.45, s"copies $i and $j: |cosine| $c >= 0.45 — transform collision")
      if (c > 0.4) overThreshold += ((i, j, c))
    }
    assert(overThreshold.size == 240,
      s"pairs above the 0.4 near-dup threshold drifted from the known 240: ${overThreshold.size}")
    assert(overThreshold.forall(p => math.abs(p._3 - 0.4134355670510279) < 1e-12),
      "a second over-threshold relative-transform class appeared: " +
        overThreshold.filterNot(p => math.abs(p._3 - 0.4134355670510279) < 1e-12).take(5))
    assert(overThreshold.head._1 == 0 && overThreshold.head._2 == 531,
      s"canonical member drifted from (0,531): ${overThreshold.head}")
  }

  test("same-lag copy pairs disagree on exactly 32 of 64 sign positions (Hadamard masks)") {
    // Two copies sharing a rotation lag differ only in their sign
    // masks; the Walsh–Hadamard construction (negate i iff
    // popcount(i & v) odd) makes any two masks disagree on mask
    // (v XOR w) — exactly half the coordinates — so their cosine is a
    // balanced ± sum of squares, never a structural near-match.
    def mask(v: Int): IndexedSeq[Boolean] =
      (0 until 64).map(i => java.lang.Integer.bitCount(i & v) % 2 == 1)
    for (v <- 0 until 16; w <- (v + 1) until 16) {
      val dis = (0 until 64).count(i => mask(v)(i) != mask(w)(i))
      assert(dis == 32, s"masks $v and $w disagree on $dis positions, want 32")
    }
  }

  test("Column-expression transform matches the local mirror on sampled copies") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val baseVec = Array.fill(64)((rnd.nextGaussian() / 8.0).toFloat)
    val one = Seq(Tuple1(baseVec)).toDF("embedding")
    val sample = Seq(0, 1, 5, 62, 63, 64, 100, 126, 127, 315, 500, 999, 1007)
    sample.foreach { c =>
      val viaColumn = one.select(ScaleUp.embedMutation(c, col("embedding")).as("e"))
        .head().getSeq[Float](0).toArray
      val viaMirror = ScaleUp.embedMutationLocal(c, baseVec)
      assert(viaColumn.toSeq == viaMirror.toSeq, s"copy $c: Column path diverges from mirror")
    }
  }

  test("widenEmbedding preserves norms exactly and inner products to fp tolerance (256/1024 dims)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def vec() = Array.fill(64)((rnd.nextGaussian() / 8.0).toFloat)
    val (u, v) = (vec(), vec())
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => a(i).toDouble * b(i)).sum
    for (factor <- Seq(4, 16)) {
      val (wu, wv) = (ScaleUp.widenEmbeddingLocal(factor, u), ScaleUp.widenEmbeddingLocal(factor, v))
      assert(wu.length == 64 * factor)
      // orthogonal blocks + exact 1/sqrt(f) scale → same norm, same inner product
      assert(math.abs(dot(wu, wu) - dot(u, u)) < 1e-6, s"norm drift at factor $factor")
      assert(math.abs(dot(wu, wv) - dot(u, v)) < 1e-6, s"inner-product drift at factor $factor")
      // blocks are pairwise distinct transforms: no two blocks equal
      val blocks = wu.grouped(64).toSeq
      assert(blocks.distinct.size == factor, "per-block transforms must be pairwise distinct")
    }
    // Column expression == local mirror
    val one = Seq(Tuple1(u)).toDF("embedding")
    val viaColumn = one.select(ScaleUp.widenEmbedding(4, col("embedding")).as("e"))
      .head().getSeq[Float](0).toArray
    assert(viaColumn.toSeq == ScaleUp.widenEmbeddingLocal(4, u).toSeq)
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
