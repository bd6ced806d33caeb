package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Double, Boolean)*): DataFrame =
    rows.toSeq.toDF("x", "a")

  private def totalPsi(df: DataFrame, buckets: Int = 8): Long =
    Drift.psi(df, $"x", $"a", buckets)
      .select($"psi_microbits").as[Long].head()

  test("identical distributions on both sides drift by ~zero") {
    val rows = (1 to 200).map(i => (i.toDouble % 17, true)) ++
      (1 to 200).map(i => (i.toDouble % 17, false))
    val psi = totalPsi(frame(rows: _*))
    // identical per-bucket counts → p_a == p_b in every bucket → 0,
    // up to micro-bit rounding of 8 exact-zero terms
    assert(psi == 0L, s"psi=$psi")
  }

  test("a shifted distribution drifts more than a resampled one") {
    val rng = new scala.util.Random(7)
    val base = Seq.fill(400)(rng.nextGaussian() * 10 + 50)
    val same = Seq.fill(400)(rng.nextGaussian() * 10 + 50)
    val shifted = Seq.fill(400)(rng.nextGaussian() * 10 + 70)
    val small = totalPsi(frame((base.map((_, true)) ++ same.map((_, false))): _*))
    val large = totalPsi(frame((base.map((_, true)) ++ shifted.map((_, false))): _*))
    assert(large > small, s"shifted=$large resampled=$small")
    assert(large > 250000L, s"a 2-sigma shift should read as major drift, got $large")
  }

  test("per-bucket decomposition: spine is complete, contributions non-negative, totals add up") {
    val rows = (1 to 100).map(i => (i.toDouble, i % 3 == 0))
    val b = Drift.psiBuckets(frame(rows: _*), $"x", $"a", 10)
      .select($"bucket", $"c_a", $"c_b", $"psi_microbits")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(b.map(_._1).toSeq == (0 until 10))
    assert(b.forall(_._4 >= 0L))
    assert(b.map(_._2).sum == rows.count(_._2) && b.map(_._3).sum == rows.count(!_._2))
    val total = Drift.psi(frame(rows: _*), $"x", $"a", 10)
      .select($"n_a", $"n_b", $"psi_microbits").as[(Long, Long, Long)].head()
    assert(total == ((rows.count(_._2).toLong, rows.count(!_._2).toLong, b.map(_._4).sum)))
  }

  test("NULL values and NULL sides are excluded; empty input reads as zero drift") {
    val df = Seq[(Option[Double], Option[Boolean])](
      (Some(1.0), Some(true)), (None, Some(false)), (Some(2.0), None))
      .toDF("x", "a")
    val b = Drift.psiBuckets(df, $"x", $"a", 4)
      .agg(sum($"c_a") + sum($"c_b")).as[Long].head()
    assert(b == 1L)
    val empty = frame()
    assert(totalPsi(empty, 4) == 0L)
  }

  test("one-sided input stays finite (Laplace smoothing, no log of zero)") {
    val rows = (1 to 50).map(i => (i.toDouble, true))
    val psi = totalPsi(frame(rows: _*), 8)
    assert(psi >= 0L) // defined and non-negative even with n_b = 0
  }
}
