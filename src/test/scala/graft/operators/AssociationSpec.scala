package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  private def xy(rows: (Double, Double)*): DataFrame =
    rows.toSeq.toDF("x", "y")

  private def corrMicro(df: DataFrame): Option[Long] = {
    val r = Association.pearson(df, $"x", $"y").select($"corr_micro").collect().head
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("perfectly linear data reads exactly ±1") {
    val pos = xy((1 to 20).map(i => (i.toDouble, 2.0 * i + 3)): _*)
    val neg = xy((1 to 20).map(i => (i.toDouble, -0.5 * i + 9)): _*)
    assert(corrMicro(pos).contains(1000000L))
    assert(corrMicro(neg).contains(-1000000L))
  }

  test("pearson matches an independent double-precision reference on noisy data") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(300)((rng.nextDouble() * 50, rng.nextDouble() * 50))
      .map { case (a, b) => (a, 0.7 * a + 0.3 * b) }
    // reference over the SAME cent-quantized values the operator uses
    val q = rows.map { case (a, b) =>
      (math.floor(a * 100 + 0.5).toLong, math.floor(b * 100 + 0.5).toLong) }
    val n = q.length.toDouble
    val (sx, sy) = (q.map(_._1).sum.toDouble, q.map(_._2).sum.toDouble)
    val sxy = q.map(p => p._1 * p._2).sum.toDouble
    val (sxx, syy) = (q.map(p => p._1 * p._1).sum.toDouble, q.map(p => p._2 * p._2).sum.toDouble)
    val ref = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = corrMicro(xy(rows: _*)).get
    assert(math.abs(got - math.floor(ref * 1e6 + 0.5).toLong) <= 1, s"got=$got ref=$ref")
  }

  test("degenerate inputs: constant side, empty input, and NULLs → NULL corr") {
    assert(corrMicro(xy((1 to 5).map(i => (i.toDouble, 7.0)): _*)).isEmpty)
    assert(corrMicro(xy()).isEmpty)
    val withNulls = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(2.0)), (Some(2.0), None), (None, Some(3.0)), (Some(3.0), Some(6.0)))
      .toDF("x", "y")
    val n = Association.pearson(withNulls, $"x", $"y").select($"n").as[Long].head()
    assert(n == 2L) // only fully-present pairs count
  }

  test("welch t matches a double-precision reference on two shifted samples") {
    val rng = new scala.util.Random(3)
    val a = Seq.fill(120)(rng.nextGaussian() * 4 + 20)
    val b = Seq.fill(80)(rng.nextGaussian() * 6 + 18)
    val df = (a.map((_, true)) ++ b.map((_, false))).toDF("x", "side")
    val row = Association.welchT(df, $"x", $"side")
      .select($"n_a", $"n_b", $"t_micro", $"dof_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(row._1 == 120L && row._2 == 80L)
    // reference on the same cent-quantized values
    def q(v: Seq[Double]) = v.map(x => math.floor(x * 100 + 0.5) / 100.0)
    val (qa, qb) = (q(a), q(b))
    def meanVar(v: Seq[Double]) = {
      val m = v.sum / v.size
      (m, v.map(x => (x - m) * (x - m)).sum / (v.size - 1))
    }
    val ((ma, va), (mb, vb)) = (meanVar(qa), meanVar(qb))
    val (sea, seb) = (va / qa.size, vb / qb.size)
    val tRef = (ma - mb) / math.sqrt(sea + seb)
    val dofRef = (sea + seb) * (sea + seb) /
      (sea * sea / (qa.size - 1) + seb * seb / (qb.size - 1))
    assert(math.abs(row._3 - math.floor(tRef * 1e6 + 0.5).toLong) <= 2, s"t=${row._3} ref=$tRef")
    assert(math.abs(row._4 - math.floor(dofRef * 1e6 + 0.5).toLong) <= 2, s"dof=${row._4} ref=$dofRef")
  }

  test("welch t: identical sides ≈ 0; an undersized side yields NULLs") {
    val same = ((1 to 50).map(i => (i.toDouble % 7, true)) ++
      (1 to 50).map(i => (i.toDouble % 7, false))).toDF("x", "side")
    val t0 = Association.welchT(same, $"x", $"side").select($"t_micro").as[Long].head()
    assert(t0 == 0L)
    val tiny = Seq((1.0, true), (2.0, false), (3.0, false)).toDF("x", "side")
    val r = Association.welchT(tiny, $"x", $"side")
      .select($"t_micro", $"mean_a_micro").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("MI of a variable with itself is its entropy — exact at power-of-two uniform") {
    // 4 uniform categories, a == b: MI = H = log2 4 = 2 bits, and the
    // octave ladder is EXACT at powers of two → 500000 micro per cell
    val d = (0 until 64).map(i => (s"k${i % 4}", s"k${i % 4}")).toDF("a", "b")
    val cells = Association.mutualInformation(d, $"a", $"b")
      .select($"mi_microbits").as[Long].collect()
    assert(cells.length == 4 && cells.forall(_ == 500000L))
  }

  test("MI of independent uniform variables is zero in every cell") {
    val d = (0 until 64).map(i => (s"a${i % 4}", s"b${(i / 4) % 4}")).toDF("a", "b")
    val cells = Association.mutualInformation(d, $"a", $"b")
      .select($"mi_microbits").as[Long].collect()
    assert(cells.length == 16 && cells.forall(_ == 0L)) // r = 1 exactly per cell
  }

  test("skewed joint: per-cell signs are pointwise, counts reconcile") {
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val out = Association.mutualInformation(rows.toDF("a", "b"), $"a", $"b")
      .select($"a", $"b", $"c_ab", $"mi_microbits")
      .as[(String, String, Long, Long)].collect()
    assert(out.map(_._3).sum == 80L)
    // concordant cells (x,p)/(y,q) carry positive PMI, discordant negative
    val byCell = out.map(r => (r._1, r._2) -> r._4).toMap
    assert(byCell(("x", "p")) > 0 && byCell(("y", "q")) > 0)
    assert(byCell(("x", "q")) < 0 && byCell(("y", "p")) < 0)
    // and the total is positive (association exists)
    assert(out.map(_._4).sum > 0)
  }
}
