package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** Top-PC power iteration and the ABTT correction: exact moments,
  * shift invariance of the scatter, known-eigenvector convergence,
  * collinear-corpus residuals, exclusion rules. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def embDf(rows: Seq[(Long, Seq[Double], Int)]) =
    rows.map { case (id, v, l) => (id, v.map(_.toFloat), l) }
      .toDF("vec_id", "embedding", "label")

  test("moments: exact integer sums on a hand-computed corpus") {
    // vectors (1.0, 2.0) and (3.0, 4.0) -> micro (1e6, 2e6), (3e6, 4e6)
    val df = embDf(Seq((1L, Seq(1.0, 2.0), 0), (2L, Seq(3.0, 4.0), 0)))
    val m = Pca.moments(df, 2)
    assert(m.n == 2L)
    assert(m.s.toSeq == Seq(BigInt(4000000), BigInt(6000000)))
    assert(m.m((1, 1)) == BigInt(1000000L) * 1000000L + BigInt(3000000L) * 3000000L)
    assert(m.m((1, 2)) == BigInt(1000000L) * 2000000L + BigInt(3000000L) * 4000000L)
    assert(m.m((2, 2)) == BigInt(2000000L) * 2000000L + BigInt(4000000L) * 4000000L)
  }

  test("moments excludes NULL and wrong-length embeddings") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), 0),
      (2L, null.asInstanceOf[Seq[Float]], 0),
      (3L, Seq(1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    assert(Pca.moments(df, 2).n == 1L)
  }

  test("normalizedScatter is symmetric and exactly shift-invariant") {
    val base = Seq((1L, Seq(0.1, 0.2), 0), (2L, Seq(0.3, -0.1), 1), (3L, Seq(-0.2, 0.4), 2))
    val shifted = base.map { case (id, v, l) => (id, v.map(_ + 0.125), l) }
    val g1 = Pca.normalizedScatter(Pca.moments(embDf(base), 2), 2)
    val g2 = Pca.normalizedScatter(Pca.moments(embDf(shifted), 2), 2)
    // 0.125 is exact in binary, so quantized components shift by an
    // exact constant and the centered scatter is bit-identical
    assert(g1.flatten.toSeq == g2.flatten.toSeq)
    assert(g1(0)(1) == g1(1)(0))
  }

  test("powerIterate converges to the dominant eigenvector") {
    val g = Array(Array(4.0, 0.0), Array(0.0, 1.0))
    val u = Pca.powerIterate(g, 2, rounds = 24)
    assert(math.abs(math.abs(u(0)) - 1.0) < 1e-9 && math.abs(u(1)) < 1e-9)
    // rotation-mixed matrix with known dominant direction (1,1)/sqrt(2):
    // G = Q diag(3,1) Q^T for Q = [[c,-c],[c,c]], c = 1/sqrt(2) -> [[2,1],[1,2]]
    val g2 = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val u2 = Pca.powerIterate(g2, 2, rounds = 24)
    assert(math.abs(math.abs(u2(0)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(u2(0) - u2(1)) < 1e-9)
  }

  test("powerIterate on a zero matrix yields the zero vector") {
    assert(Pca.powerIterate(Array.fill(3, 3)(0.0), 3, 8).toSeq == Seq(0.0, 0.0, 0.0))
  }

  test("collinear corpus: residual share ~0 and projection tracks the spread") {
    // all vectors on the line t * (0.6, 0.8): top PC captures everything
    val df = embDf(Seq(
      (1L, Seq(0.06, 0.08), 0), (2L, Seq(0.12, 0.16), 0),
      (3L, Seq(0.30, 0.40), 1), (4L, Seq(-0.24, -0.32), 1)))
    val (mom, u) = Pca.fit(df, 2, 12)
    val out = Pca.abttLabelStats(df, 2, mom, u)
      .select($"label", $"n_vecs", $"mean_resid_share_micro")
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2) == Seq(2L, 2L))
    // quantization noise only: residual share well under 0.1%
    assert(out.forall(_._3 < 1000L), s"resid shares: $out")
  }

  test("abtt projections: vector at the centroid has zero projection and zero residual") {
    // two symmetric vectors and their exact midpoint at the origin
    val df = embDf(Seq(
      (1L, Seq(0.2, 0.1), 0), (2L, Seq(-0.2, -0.1), 0), (3L, Seq(0.0, 0.0), 1)))
    val (mom, u) = Pca.fit(df, 2, 12)
    val out = Pca.abttLabelStats(df, 2, mom, u)
      .select($"label", $"mean_abs_proj_micro", $"mean_resid_share_micro")
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    // label 1 is the exact centroid -> cd = 0 -> p = 0, resid share 0 (guard)
    assert(out.find(_._1 == 1).get._2 == 0L)
    assert(out.find(_._1 == 1).get._3 == 0L)
  }
}
