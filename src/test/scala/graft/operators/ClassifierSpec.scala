package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Double, Double, Double)*): DataFrame =
    rows.toSeq.toDF("y", "x1", "x2")

  /** Independent driver replay of the training loop: same softsign
    * link, same 1e-6 gradient grid, same update arithmetic — a second
    * implementation, not a call back into the operator. */
  private def reference(rows: Seq[(Double, Double, Double)], nIter: Int,
      lr: Double): Array[Double] = {
    val w = Array(0.0, 0.0, 0.0)
    for (_ <- 1 to nIter) {
      val sums = Array(0L, 0L, 0L)
      rows.foreach { case (y, x1, x2) =>
        val z = w(0) + w(1) * x1 + w(2) * x2
        val p = 0.5 + 0.5 * z / (1.0 + math.abs(z))
        val r = p - y
        sums(0) += math.floor(r * 1e6 + 0.5).toLong
        sums(1) += math.floor(r * x1 * 1e6 + 0.5).toLong
        sums(2) += math.floor(r * x2 * 1e6 + 0.5).toLong
      }
      for (i <- 0 to 2) w(i) = w(i) - lr * (sums(i).toDouble / 1e6 / rows.length)
    }
    w
  }

  test("softsign link: exact 0.5 at zero, strictly monotone, bounded in (0, 1)") {
    val zs = Seq(-100.0, -3.0, -0.5, 0.0, 0.5, 3.0, 100.0)
    val ps = zs.map(z => (z, 0.5 + 0.5 * z / (1.0 + math.abs(z))))
    val got = Classifier.score(zs.toDF("v"), Seq($"v" * lit(0.0) + $"v"),
        Array(0.0, 1.0))
      .select($"z", $"p").as[(Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == ps)
    assert(got.map(_._2).sliding(2).forall(p => p(0) < p(1)))
    assert(got.forall { case (_, p) => p > 0.0 && p < 1.0 })
    assert(got.find(_._1 == 0.0).get._2 == 0.5)
  }

  test("matches the independent replay bit-for-bit, and learns a separable rule") {
    val rng = new scala.util.Random(11)
    // y = [x1 > 0], x2 is noise
    val rows = (0 until 400).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      (if (x1 > 0) 1.0 else 0.0, x1, x2)
    }
    val got = Classifier.fitSoftsignLogit(frame(rows: _*), Seq($"x1", $"x2"), $"y",
      nIter = 8, lr = 1.0)
    val ref = reference(rows, 8, 1.0)
    assert(got.toSeq == ref.toSeq, s"got=${got.toSeq} ref=${ref.toSeq}")
    assert(got(1) > 0.5, s"separating weight should be clearly positive: ${got(1)}")
    assert(math.abs(got(2)) < got(1) / 2, "noise weight should stay small")
    val scored = Classifier.score(frame(rows: _*), Seq($"x1", $"x2"), got)
    val acc = scored.filter($"pred" === $"y".cast("int")).count().toDouble / rows.size
    assert(acc > 0.9, s"train accuracy $acc")
  }

  test("deterministic across partitionings (quantized gradient sums)") {
    val rows = (0 until 300).map(i =>
      ((i % 3).min(1).toDouble, (i % 7).toDouble / 3.0, (i % 5).toDouble / 2.0))
    val a = Classifier.fitSoftsignLogit(frame(rows: _*), Seq($"x1", $"x2"), $"y")
    val b = Classifier.fitSoftsignLogit(frame(rows: _*).repartition(13),
      Seq($"x1", $"x2"), $"y")
    assert(a.toSeq == b.toSeq)
  }

  test("NULL rows are excluded; empty input returns zero weights") {
    val withNulls = Seq[(Option[Double], Option[Double], Option[Double])](
      (Some(1.0), Some(2.0), Some(0.0)), (None, Some(1.0), Some(1.0)),
      (Some(0.0), None, Some(1.0)), (Some(0.0), Some(-2.0), None),
      (Some(0.0), Some(-2.0), Some(0.0)))
      .toDF("y", "x1", "x2")
    val w = Classifier.fitSoftsignLogit(withNulls, Seq($"x1", $"x2"), $"y",
      nIter = 2, lr = 1.0)
    // only rows 1 and 5 survive; just assert it trained on them (w1 > 0:
    // the surviving rows are perfectly separated by x1)
    assert(w(1) > 0)
    val empty = Classifier.fitSoftsignLogit(frame(), Seq($"x1", $"x2"), $"y")
    assert(empty.toSeq == Seq(0.0, 0.0, 0.0))
  }

  test("parameter validation fails fast") {
    val df = frame((1.0, 1.0, 1.0))
    intercept[IllegalArgumentException](
      Classifier.fitSoftsignLogit(df, Seq($"x1"), $"y", nIter = 0))
    intercept[IllegalArgumentException](
      Classifier.fitSoftsignLogit(df, Seq($"x1"), $"y", lr = -1.0))
    intercept[IllegalArgumentException](
      Classifier.score(df, Seq($"x1", $"x2"), Array(0.0, 1.0)))
  }
}
