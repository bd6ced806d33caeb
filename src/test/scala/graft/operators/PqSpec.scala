package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization ([[Pq]]): codebook training determinism,
  * geometry validation, exact reconstruction on a separable fixture,
  * ADC search parity with brute force when the codec is loss-less,
  * and the IVFADC composition's plan shape (equi-join on cell, never
  * a nested-loop scan of the corpus). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  // 4-dim corpus built from two distinct subvectors per 2-dim
  // subspace: with m=2, k=2 the first-2 init IS the codebook and the
  // 1e-9-grid means are exact, so reconstruction is loss-less
  private def separable = vecs(
    0L -> Seq(1f, 0f, 0f, 1f), 1L -> Seq(0f, 1f, 1f, 0f),
    2L -> Seq(1f, 0f, 0f, 1f), 3L -> Seq(0f, 1f, 1f, 0f),
    4L -> Seq(1f, 0f, 1f, 0f), 5L -> Seq(0f, 1f, 0f, 1f))

  test("fitCodebooks is deterministic and respects the (m, k) geometry") {
    val rng = new scala.util.Random(7)
    val d = vecs((0L until 40L).map(i => i -> Seq.fill(8)(rng.nextFloat() * 2 - 1)): _*)
    val a = Pq.fitCodebooks(d, m = 4, k = 4, nIter = 2, sampleN = 32)
    val b = Pq.fitCodebooks(d, m = 4, k = 4, nIter = 2, sampleN = 32)
    assert(a.map(c => (c.sub, c.cell, c.coords.toSeq, c.cc)) ==
      b.map(c => (c.sub, c.cell, c.coords.toSeq, c.cc)))
    assert(a.map(_.sub).distinct.sorted == Seq(0, 1, 2, 3))
    assert(a.forall(c => c.cell >= 0 && c.cell < 4 && c.coords.length == 2))
    assert(a.groupBy(_.sub).values.forall(_.size <= 4))
    // cc is the precomputed left-fold self-dot
    assert(a.forall(c => c.cc == c.coords.foldLeft(0.0)((s, x) => s + x * x)))
  }

  test("fitCodebooks fails fast on contract violations") {
    val d = separable
    intercept[IllegalArgumentException](Pq.fitCodebooks(d, m = 0, k = 2, nIter = 1, sampleN = 4))
    intercept[IllegalArgumentException](Pq.fitCodebooks(d, m = 2, k = 4, nIter = 1, sampleN = 2))
    // dim 4 not divisible into 3 subspaces
    intercept[IllegalArgumentException](Pq.fitCodebooks(d, m = 3, k = 2, nIter = 1, sampleN = 4))
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](Pq.fitCodebooks(empty, m = 2, k = 2, nIter = 1, sampleN = 4))
    intercept[IllegalArgumentException](Pq.reconstruct(d, Seq.empty))
    intercept[IllegalArgumentException](
      Pq.ivfAdcTopK(d, d, Seq.empty, Seq(Pq.Code(0, 0, Array(1.0, 0.0), 1.0)), k = 1))
  }

  test("reconstruct is loss-less on the separable fixture (codes valid, recon == input)") {
    val d = separable
    val books = Pq.fitCodebooks(d, m = 2, k = 2, nIter = 2, sampleN = 6)
    val rec = Pq.reconstruct(d, books)
      .select($"vec_id", $"embedding", $"codes", $"recon")
      .as[(Long, Seq[Float], Seq[Int], Seq[Double])].collect().sortBy(_._1)
    assert(rec.length == 6)
    rec.foreach { case (_, emb, codes, recon) =>
      assert(codes.length == 2 && codes.forall(c => c >= 0 && c < 2))
      assert(recon.length == 4)
      assert(recon == emb.map(_.toDouble))
    }
  }

  test("adcTopK matches brute force when reconstruction is exact") {
    val d = separable
    val q = d.filter($"vec_id" < 2)
    val books = Pq.fitCodebooks(d, m = 2, k = 2, nIter = 2, sampleN = 6)
    val adc = Pq.adcTopK(d, q, books, k = 3)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val brute = Similarity.bruteForceTopK(d, q, k = 3)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(adc.toSeq == brute.toSeq)
    assert(adc.count(_._1 == 0L) == 3) // full k per query, never self
    assert(adc.forall(r => r._3 != r._1))
  }

  test("SQL-exposed codec kernels reject malformed codebooks at ANALYSIS time") {
    // graft_pq_encode is reachable from raw SQL via GraftExtensions, so
    // a malformed codebook must die in checkInputDataTypes — never as an
    // ArrayIndexOutOfBoundsException mid-execution (empty subspace ⇒
    // bi = -1 ⇒ cellIds(-1); short cc ⇒ cc(ci) overrun).
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql).collect())
      assert(e.getMessage.contains(frag), s"wanted '$frag' in: ${e.getMessage}")
    }
    val vec = "array(1.0D, 2.0D)"
    // valid shape for reference: m=2 subspaces of 1 cell each, subDim=1
    val ok = spark.sql(
      s"SELECT graft_pq_encode($vec, array(0,1,2), array(0,0), array(array(1.0D),array(2.0D)), array(1.0D,4.0D)) AS c")
      .head().getSeq[Int](0)
    assert(ok == Seq(0, 0))
    bad(s"SELECT graft_pq_encode($vec, array(0,2,2), array(0,1), array(array(1.0D),array(2.0D)), array(1.0D,4.0D))",
      "strictly increasing")
    bad(s"SELECT graft_pq_encode(array(1.0D), array(1,2), array(0,1), array(array(1.0D),array(2.0D)), array(1.0D,4.0D))",
      "start at 0")
    bad(s"SELECT graft_pq_encode($vec, array(0,1,2), array(0,0), array(array(1.0D),array(2.0D)), array(1.0D))",
      "cc/cellIds arity mismatch")
    bad(s"SELECT graft_pq_encode($vec, array(0,1,2), array(0,0), array(array(1.0D), CAST(NULL AS array<double>)), array(1.0D,4.0D))",
      "NULL centroids")
    bad(s"SELECT graft_pq_encode($vec, array(0,1,2), array(0,0), array(array(1.0D),array(2.0D,3.0D)), array(1.0D,4.0D))",
      "share one dimension")
    bad(s"SELECT graft_pq_recon(array(0,0), array(0,2,2), array(0,1), array(array(1.0D),array(2.0D)))",
      "strictly increasing")
  }

  test("ivfAdcTopK scores only probed cells and keeps the cell join an equi-join") {
    val d = separable
    val q = d.filter($"vec_id" < 2)
    val cents = KMeans.fit(d, k = 2, nIter = 2)
    val books = Pq.fitCodebooks(d, m = 2, k = 2, nIter = 2, sampleN = 6)
    // nProbe = all cells ⇒ candidate set == corpus ⇒ parity with ADC
    val full = Pq.ivfAdcTopK(d, q, cents, books, k = 3, nProbe = 2)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val adc = Pq.adcTopK(d, q, books, k = 3)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(full.toSeq == adc.toSeq)
    // nProbe = 1: every neighbor lives in the query's own probe cell
    val one = Pq.ivfAdcTopK(d, q, cents, books, k = 3, nProbe = 1)
    val cells = KMeans.assignCells(d, cents).select($"vec_id", $"cell")
      .as[(Long, Int)].collect().toMap
    one.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .foreach { case (qid, nid) => assert(cells(nid) == cells(qid)) }
    // scale posture: the candidate generator is a broadcast EQUI-join
    // on cell — a nested-loop corpus scan here would be the O(n·m)
    // pattern the plan sweep bans
    val plan = Pq.ivfAdcTopK(d, q, cents, books, k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("mForDim pins the measured m ∝ dim law; fitCodebooksAuto derives geometry from data") {
    // 8-dim subvectors at production dims, never below 8 subspaces,
    // clamped for toy dims (SCALE.md production-dimension study)
    assert(Pq.mForDim(64) == 8)
    assert(Pq.mForDim(256) == 32)
    assert(Pq.mForDim(768) == 96)
    assert(Pq.mForDim(1024) == 128)
    assert(Pq.mForDim(1536) == 192)
    assert(Pq.mForDim(4) == 4) // toy clamp: m can never exceed dim
    // auto geometry on the 4-dim fixture: m = 4 (1-dim subvectors),
    // and the books agree with the explicit-m call exactly
    val auto = Pq.fitCodebooksAuto(separable, k = 2, nIter = 2, sampleN = 6)
    assert(auto.map(_.sub).distinct.sorted == Seq(0, 1, 2, 3))
    val explicit = Pq.fitCodebooks(separable, m = 4, k = 2, nIter = 2, sampleN = 6)
    assert(auto.map(c => (c.sub, c.cell, c.coords.toSeq)) ==
      explicit.map(c => (c.sub, c.cell, c.coords.toSeq)))
  }

  test("d256 default geometry recovers the measured recall floor (the m-law's quality pin)") {
    // the committed production-dimension gate over the sf0.001 corpus:
    // fitCodebooksAuto at 256 dims must choose m = 32 and land at or
    // above the study's floor (measured 0.80/0.72/0.58 across the
    // oracle SFs; floor 0.55) — a default-geometry regression that
    // collapses production-dim recall fails HERE even before the
    // driver's hash gate sees it
    val row = graft.analytics.DataOps.pqRecallD256(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Double]("recall") >= 0.55)
    assert(row.getAs[Boolean]("meets_floor"))
  }
}
