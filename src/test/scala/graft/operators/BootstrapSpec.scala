package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Double, Long)*): DataFrame =
    rows.toSeq.toDF("value", "id")

  private val P = 1000000007L

  /** Independent Scala replay of the deterministic pipeline: same
    * hash, same CDF ladder, same decimal-exact replica means, same
    * rank picks — a second implementation, not a call back into the
    * operator. */
  private def reference(rows: Seq[(Double, Long)], b: Int, alpha: Double,
      scale: Int): (Long, Long, Long, Long) = {
    val q = math.pow(10, scale)
    val vals = rows.map { case (v, k) => (math.floor(v * q + 0.5).toLong, k) }
    def w(k: Long, r: Long): Long = {
      val h = ((k % P) * 2654435761L) % P
      val u = (((2 * r + 1) * h + 999983L * r) % P).toDouble / P.toDouble
      Bootstrap.PoissonCdf.count(u >= _).toLong
    }
    val means = (0L until b.toLong).flatMap { r =>
      val (swx, sw) = vals.foldLeft((BigInt(0), BigInt(0))) { case ((ax, aw), (xi, k)) =>
        val wi = w(k, r); (ax + BigInt(wi) * xi, aw + wi)
      }
      if (sw > 0) Some((r, swx.toDouble / sw.toDouble / q)) else None
    }.sortBy { case (r, rm) => (rm, r) }.map(_._2)
    val loRank = math.max(1, math.floor(b * (alpha / 2)).toInt + 1)
    val hiRank = math.min(b, math.floor(b * (1 - alpha / 2)).toInt + 1)
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val mean = vals.map(v => BigInt(v._1)).sum.toDouble / vals.length / q
    (vals.length.toLong, micro(mean), micro(means(loRank - 1)), micro(means(hiRank - 1)))
  }

  test("Poisson(1) CDF ladder is the driver-exact inverse-CDF table") {
    val cdf = Bootstrap.PoissonCdf
    assert(cdf.length == 8)
    assert(cdf.head == math.exp(-1.0))
    assert(cdf.sliding(2).forall(p => p(0) < p(1)) && cdf.last < 1.0)
    // P(X <= 7) for Poisson(1): 1 - tail ~ 1.02e-5
    assert(math.abs(cdf.last - 0.99998989) < 1e-6)
  }

  test("hashed weights behave like Poisson(1): mean ~ 1, P(w=0) ~ 1/e") {
    val n = 2000
    val b = 64
    val ws = for (k <- 0 until n; r <- 0 until b) yield {
      val h = ((k.toLong % P) * 2654435761L) % P
      val u = (((2L * r + 1) * h + 999983L * r) % P).toDouble / P
      Bootstrap.PoissonCdf.count(u >= _)
    }
    val mean = ws.map(_.toDouble).sum / ws.length
    val p0 = ws.count(_ == 0).toDouble / ws.length
    assert(math.abs(mean - 1.0) < 0.01, s"mean weight $mean")
    assert(math.abs(p0 - math.exp(-1.0)) < 0.01, s"P(w=0) $p0")
  }

  test("matches an independent replay on a noisy sample, and the CI brackets the mean") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 400).map(i => (rng.nextGaussian() * 5 + 50, i.toLong))
    val got = Bootstrap.meanCi(frame(rows: _*), $"value", $"id")
      .select($"n", $"mean_micro", $"lo_micro", $"hi_micro")
      .as[(Long, Long, Long, Long)].head()
    val ref = reference(rows, 64, 0.05, 2)
    assert(got == ref, s"got=$got ref=$ref")
    assert(got._3 < got._2 && got._2 < got._4, "CI must bracket the mean")
    // CLT ballpark: 2·1.96·σ/√n = 2·1.96·5/20 ≈ 0.98 — a collapsed
    // (correlated-replica) CI would be far narrower
    val width = (got._4 - got._3).toDouble / 1e6
    assert(width > 0.5 && width < 2.0, s"width $width")
  }

  test("deterministic across runs and partitionings") {
    val rows = (0 until 300).map(i => ((i % 17).toDouble, i.toLong))
    val a = Bootstrap.meanCi(frame(rows: _*), $"value", $"id").collect().toSeq
    val b = Bootstrap.meanCi(frame(rows: _*).repartition(7), $"value", $"id").collect().toSeq
    assert(a == b)
  }

  test("NULL values and keys are excluded; empty input yields n=0 with NULL bounds") {
    val withNulls = Seq[(Option[Double], Option[Long])](
      (Some(1.0), Some(1L)), (None, Some(2L)), (Some(3.0), None), (Some(2.0), Some(4L)))
      .toDF("value", "id")
    val n = Bootstrap.meanCi(withNulls, $"value", $"id").select($"n").as[Long].head()
    assert(n == 2L)
    val empty = Bootstrap.meanCi(frame(), $"value", $"id").collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2) && empty.isNullAt(3))
  }

  test("parameter validation fails fast") {
    val df = frame((1.0, 1L))
    intercept[IllegalArgumentException](Bootstrap.meanCi(df, $"value", $"id", nReplicas = 2))
    intercept[IllegalArgumentException](Bootstrap.meanCi(df, $"value", $"id", alpha = 0.0))
    intercept[IllegalArgumentException](Bootstrap.meanCi(df, $"value", $"id", scale = 7))
  }
}
