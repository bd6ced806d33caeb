package graft.operators

import graft.{GraftFunctions, SparkSpec}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("graft_dot (codegen) is bit-identical to a driver-side left fold on random float arrays") {
    // NOTE: comparing the kernel against the HOF COLUMN would be
    // circular since RewriteHofDot turns that column into the kernel;
    // the reference fold runs in plain Scala instead.
    GraftFunctions.register(spark)
    val rng = new scala.util.Random(3)
    val rows = (1L to 200L).map(i => i -> Seq.fill(64)(rng.nextFloat() * 2 - 1))
    val df = rows.toDF("id", "v")
    val got = df.as("a").join(df.as("b"), $"a.id" < $"b.id").limit(500)
      .select($"a.id".as("ia"), $"b.id".as("ib"),
        GraftFunctions.dot($"a.v", $"b.v").as("native"))
      .as[(Long, Long, Double)].collect()
    assert(got.length == 500)
    val m = rows.toMap
    got.foreach { case (ia, ib, native) =>
      val (va, vb) = (m(ia), m(ib))
      var s = 0.0
      var i = 0
      while (i < 64) { s += va(i).toDouble * vb(i).toDouble; i += 1 }
      assert(native == s, s"pair ($ia,$ib)")
    }
  }

  test("graft_dot null semantics match zip_with+fold: null array, null element, length mismatch") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)),      // 11.0
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f)),    // null element
      (Seq[java.lang.Float](1f), Seq[java.lang.Float](3f, 4f)),          // length mismatch
      (null, Seq[java.lang.Float](3f, 4f))                               // null array
    ).toDF("a", "b")
    val out = df.select(
      GraftFunctions.dot($"a", $"b").as("native"),
      Similarity.dot($"a", $"b").as("hof")).collect()
    assert(out.map(r => Option(r.get(0))).toSeq ==
      Seq(Some(11.0), None, None, None))
    assert(out.forall(r => Option(r.get(0)) == Option(r.get(1))))
  }

  test("graft_dot handles int and bigint arrays") {
    GraftFunctions.register(spark)
    val out = Seq((Seq(1, 2, 3), Seq(4L, 5L, 6L))).toDF("a", "b")
      .select(GraftFunctions.dot($"a", $"b")).as[Double].collect()
    assert(out.head == 32.0)
  }

  test("bruteForceTopK ranks by cosine with deterministic tiebreaks") {
    val d = vecs(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.1f),
      2L -> Seq(0f, 1f),
      3L -> Seq(-1f, 0f))
    val out = Similarity.bruteForceTopK(d, d.filter($"vec_id" === 0), k = 2)
      .select($"query_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
      .collect().toSeq.sorted
    assert(out == Seq((0L, 1, 1L), (0L, 2, 2L)))
  }

  test("lshTopK only searches co-bucketed vectors and never exceeds k per query") {
    val rng = new scala.util.Random(11)
    val d = vecs((0L until 50L).map(i => i -> Seq.fill(8)(rng.nextFloat() * 2 - 1)): _*)
    val out = Similarity.lshTopK(d, d.filter($"vec_id" < 5), k = 3, nPlanes = 2)
    val counts = out.groupBy($"query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ <= 3))
    // approximate-contract: every returned neighbor shares the query's bucket
    val buckets = Similarity.withBucket(d, d, 2).select($"vec_id", $"bucket")
      .as[(Long, Long)].collect().toMap
    val pairs = out.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(pairs.forall { case (q, n) => buckets(q) == buckets(n) })
  }

  test("ivfTopK: neighbors come from probed cells, corpus vectors live in one cell, k respected") {
    val rng = new scala.util.Random(17)
    val d = vecs((0L until 60L).map(i => i -> Seq.fill(8)(rng.nextFloat() * 2 - 1)): _*)
    val queries = d.filter($"vec_id" < 5)
    val out = Similarity.ivfTopK(d, queries, k = 3, nCentroids = 8, nProbe = 3)
    val counts = out.groupBy($"query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ <= 3))
    // contract: every (query, neighbor) shares one of the query's probed cells
    val cCell = Similarity.withIvfCell(d, d, 8, 1).select($"vec_id", $"cell")
      .as[(Long, Long)].collect().toMap
    val qCells = Similarity.withIvfCell(queries, d, 8, 3).select($"vec_id", $"cell")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pairs = out.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(pairs.forall { case (q, n) => qCells(q).contains(cCell(n)) })
    // with nProbe = nCentroids, IVF degenerates to exact brute force
    val exact = Similarity.bruteForceTopK(d, queries, k = 3)
      .select($"query_id", $"rank", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    val full = Similarity.ivfTopK(d, queries, k = 3, nCentroids = 8, nProbe = 8)
      .select($"query_id", $"rank", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
  }

  test("graft_hyperplane_keys is bit-identical to the composed per-plane graft_dot form, " +
      "including null elements and length mismatches") {
    GraftFunctions.register(spark)
    val rng = new scala.util.Random(7)
    val planes = Seq.fill(12)(Array.fill(8)(rng.nextFloat() * 2 - 1))
    val (bands, r) = (3, 4)
    val rows: Seq[Seq[java.lang.Float]] =
      Seq.fill(100)(Seq.fill[java.lang.Float](8)(rng.nextFloat() * 2 - 1)) ++ Seq(
        Seq.fill[java.lang.Float](8)(0f),                                  // all-zero: dot = 0, no bits
        Seq[java.lang.Float](1f, null, 1f, 1f, 1f, 1f, 1f, 1f),           // null element: all keys 0
        Seq[java.lang.Float](1f, 2f, 3f))                                  // length mismatch: all keys 0
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
    val composed = (0 until bands).map { b =>
      (0 until r).map { j =>
        when(GraftFunctions.dot($"v", typedLit(planes(b * r + j).toSeq)) > 0, lit(1L << j))
          .otherwise(lit(0L))
      }.reduceLeft(_ + _)
    }
    val out = df.select(
      GraftFunctions.hyperplaneKeys($"v", planes, r).as("native"),
      array(composed: _*).as("composed"))
    assert(out.filter(not($"native" <=> $"composed")).count() == 0)
  }

  test("nearDupPairsExact finds exactly the pairs above threshold") {
    val d = vecs(
      0L -> Seq(1f, 0f),
      1L -> Seq(0.999f, 0.01f),
      2L -> Seq(0f, 1f))
    val out = Similarity.nearDupPairsExact(d, threshold = 0.9)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L)))
  }

  test("nearDupPairs (banded LSH) returns a verified subset of the exact pairs, " +
      "with full recall at generous band settings") {
    val rng = new scala.util.Random(23)
    // clustered corpus: 20 base vectors, each with 2 jittered near-dups
    val base = (0 until 20).map(_ => Array.fill(16)(rng.nextFloat() * 2 - 1))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      (0 until 3).map { j =>
        (i * 3L + j) -> v.map(x => x + (if (j == 0) 0f else (rng.nextFloat() - 0.5f) * 0.05f)).toSeq
      }
    }
    val d = vecs(rows: _*)
    val exact = Similarity.nearDupPairsExact(d, threshold = 0.95)
      .select($"vec_a", $"vec_b", $"cos").as[(Long, Long, Double)].collect().toSet
    val banded = Similarity.nearDupPairs(d, threshold = 0.95, bands = 16, planesPerBand = 2)
      .select($"vec_a", $"vec_b", $"cos").as[(Long, Long, Double)].collect().toSet
    assert(banded.subsetOf(exact))     // verification tail admits no false positives
    assert(banded == exact)            // 16 bands × 2 planes: recall 1 on this fixture
    assert(exact.nonEmpty)

    // seeded Gaussian planes (the production family): same contract —
    // verified subset, full recall at the same generous band layout
    val seeded = Similarity.nearDupPairs(d, threshold = 0.95, bands = 16, planesPerBand = 2,
        planesOpt = Some(Similarity.gaussianPlanes(7L, 32, 16)))
      .select($"vec_a", $"vec_b", $"cos").as[(Long, Long, Double)].collect().toSet
    assert(seeded == exact)
  }

  test("lshTopKMultiprobe recall dominates single-probe and hits exact at 1 plane") {
    val rng = new scala.util.Random(31)
    val d = vecs((0L until 60L).map(i => i -> Seq.fill(12)(rng.nextFloat() * 2 - 1)): _*)
    val q = d.filter($"vec_id" < 6)
    val planes = Some(Similarity.gaussianPlanes(11L, 3, 12))
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exact = hits(Similarity.bruteForceTopK(d, q, k = 4))
    val single = hits(Similarity.lshTopK(d, q, k = 4, nPlanes = 3, planesOpt = planes))
    val multi = hits(Similarity.lshTopKMultiprobe(d, q, k = 4, nPlanes = 3, planesOpt = planes))
    // probing the 1-flip neighborhood can only add candidates, so
    // measured recall must dominate the single-probe search
    assert((multi & exact).size >= (single & exact).size)
    // with 1 plane, multiprobe covers BOTH buckets = the whole corpus
    // ⇒ exact equality with brute force
    val onePlane = Some(Similarity.gaussianPlanes(11L, 1, 12))
    val full = hits(Similarity.lshTopKMultiprobe(d, q, k = 4, nPlanes = 1, planesOpt = onePlane))
    assert(full == exact)
  }

  test("gaussianPlaneGrid is a pure function of the seed, on the exact 1/1024 grid") {
    val a = Similarity.gaussianPlaneGrid(42L, 4, 16)
    val b = Similarity.gaussianPlaneGrid(42L, 4, 16)
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(Similarity.gaussianPlaneGrid(43L, 4, 16).map(_.toSeq) != a.map(_.toSeq))
    // Irwin–Hall(12) bounds on the 1024 grid, roughly centered
    val all = a.flatten
    assert(all.forall(m => m >= -6144 && m <= 6132))
    assert(math.abs(all.map(_.toLong).sum.toDouble / all.size) < 1024) // mean ≈ 0 at σ=1024
    // the float planes are the exact grid values (m/1024 is exact in float)
    val f = Similarity.gaussianPlanes(42L, 4, 16)
    assert(f.flatten.zip(all).forall { case (fl, m) => fl.toDouble == m / 1024.0 })
  }

  test("ivfTopKTrained: probing every trained cell reproduces brute-force exactly") {
    val rng = new scala.util.Random(29)
    val d = vecs((0L until 40L).map(i =>
      i -> Seq.fill(8)(rng.nextFloat() * 2 - 1)): _*)
    val q = d.filter($"vec_id" < 4)
    val cents = KMeans.fit(d, k = 4, nIter = 2)
    val exact = Similarity.bruteForceTopK(d, q, k = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val trained = Similarity.ivfTopKTrained(d, q, cents, k = 3, nProbe = cents.size)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(trained == exact) // all cells probed = no candidate ever missed
    // and a 1-probe search returns a (possibly shorter) subset per query
    val oneProbe = Similarity.ivfTopKTrained(d, q, cents, k = 3, nProbe = 1)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(oneProbe.nonEmpty)
  }

  test("nearDupPairs rejects out-of-range planesPerBand instead of wrapping bit positions") {
    val d = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    intercept[IllegalArgumentException](Similarity.nearDupPairs(d, 0.9, bands = 1, planesPerBand = 64))
    intercept[IllegalArgumentException](Similarity.nearDupPairs(d, 0.9, bands = 1, planesPerBand = 0))
    intercept[IllegalArgumentException](Similarity.nearDupPairs(d, 0.9, bands = 0, planesPerBand = 4))
  }

  test("graft_hyperplane_keys type-check rejects planesPerBand outside 1..63 at the SQL level") {
    GraftFunctions.register(spark)
    val d = vecs(0L -> Seq(1f, 0f))
    d.createOrReplaceTempView("hk_bounds")
    val err = intercept[Exception](
      spark.sql("SELECT graft_hyperplane_keys(embedding, array(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))), 64) FROM hk_bounds").collect())
    assert(err.getMessage.contains("1..63"))
  }

  test("withBucket uses rank-based bit positions: anchor ids >= 63 don't overflow the bucket") {
    // two orthogonal groups, all ids far above 63 — raw-id bit positions
    // would collapse every plane into Long.MaxValue
    val d = vecs(
      100L -> Seq(1f, 0f),
      101L -> Seq(0.9f, 0.1f),
      200L -> Seq(-1f, 0.1f),
      201L -> Seq(-0.9f, 0f))
    val buckets = Similarity.withBucket(d, d, 2).select($"vec_id", $"bucket")
      .as[(Long, Long)].collect().toMap
    // planes are vectors 100 and 101; group {100,101} scores positive on
    // both (bits 0 and 1), group {200,201} negative on both
    assert(buckets(100L) == 3L && buckets(101L) == 3L)
    assert(buckets(200L) == 0L && buckets(201L) == 0L)
    assert(buckets.values.forall(b => b >= 0L && b < 4L))
  }

  test("randomProject: deterministic, right arity, and distortion shrinks as rDim grows") {
    val dim = 32
    // deterministic pseudo-random unit-ish vectors
    val data = (0L until 40L).map { i =>
      i -> (0 until dim).map(d => (((i * 31 + d) * 2654435761L % 1000) / 1000.0f - 0.5f)).toSeq
    }
    val df = data.toDF("vec_id", "embedding")
    def meanErr(r: Int): Double = {
      val proj = Similarity.randomProject(df, Similarity.gaussianPlanes(7L, r, dim))
      val o = df.select($"vec_id".as("id"), $"embedding".as("v"))
      val p = proj.select($"vec_id".as("id"), $"embedding".as("pv"))
      val both = o.join(p, "id")
      val q = both.filter($"id" < 5)
        .select($"id".as("qid"), $"v".as("qv"), $"pv".as("qp"))
      both.filter($"id" >= 5).crossJoin(q)
        .select(abs(Similarity.cosine($"qv", $"v") - Similarity.cosine($"qp", $"pv")).as("e"))
        .agg(avg($"e")).as[Double].head()
    }
    val (e4, e24) = (meanErr(4), meanErr(24))
    assert(e24 < e4, s"JL: rDim 24 ($e24) must distort less than rDim 4 ($e4)")
    // determinism + arity
    val p1 = Similarity.randomProject(df, Similarity.gaussianPlanes(7L, 8, dim))
    val p2 = Similarity.randomProject(df, Similarity.gaussianPlanes(7L, 8, dim))
    assert(p1.collect().map(_.toString).sorted.sameElements(p2.collect().map(_.toString).sorted))
    assert(p1.select(size($"embedding")).distinct().as[Int].collect().toSeq == Seq(8))
  }
}
