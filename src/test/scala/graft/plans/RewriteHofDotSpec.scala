package graft.plans

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class RewriteHofDotSpec extends SparkSpec {
  import spark.implicits._

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // repartition keeps the source non-local: ConvertToLocalRelation
  // would otherwise evaluate literal projections during optimization
  // and leave no plan to inspect
  private val floats = Seq(
    (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (Seq(0.5f, -1f, 2f), Seq(1f, 1f, 1f))).toDF("a", "b").repartition(2)

  test("the HOF dot spelling is rewritten to the graft_dot kernel") {
    val df = floats.select(Similarity.dot($"a", $"b").as("d"))
    val p = optimized(df)
    assert(p.contains("graft_dot"), p)
    assert(!p.contains("aggregate("), p)
    // and the value is the kernel's (== the fold's, bit-for-bit)
    assert(df.as[Double].collect().toSet == Set(32.0, 1.5))
  }

  test("every inlined copy is rewritten: cosine (3 dots through CollapseProject) has no HOF left") {
    val p = optimized(floats.select(Similarity.cosine($"a", $"b").as("c")))
    assert(!p.contains("aggregate("), p)
    assert("graft_dot".r.findAllIn(p).size >= 3, p)
  }

  test("rewritten plans produce bit-identical values to a driver-side left fold") {
    val rng = new scala.util.Random(41)
    val rows = (1L to 50L).map(i => (i, Seq.fill(32)(rng.nextFloat() * 2 - 1),
      Seq.fill(32)(rng.nextFloat() * 2 - 1)))
    val out = rows.toDF("id", "a", "b")
      .select($"id", Similarity.dot($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, a, b) =>
      var s = 0.0
      var i = 0
      while (i < 32) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      assert(out(id) == s, s"id $id")
    }
  }

  test("near-miss shapes keep their own semantics (no rewrite)") {
    // wrong seed: 1.0
    val wrongSeed = floats.select(aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!optimized(wrongSeed).contains("graft_dot"))
    assert(wrongSeed.as[Double].collect().toSet == Set(33.0, 2.5))
    // negative zero seed: empty arrays must yield -0.0, kernel gives +0.0
    val negZero = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
      .repartition(1)
      .select(aggregate(
        zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(-0.0), (acc, v) => acc + v).as("d"))
    assert(!optimized(negZero).contains("graft_dot"))
    assert(java.lang.Double.doubleToRawLongBits(negZero.as[Double].collect().head) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    // merge that is not a bare add
    val notAdd = floats.select(aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc - v).as("d"))
    assert(!optimized(notAdd).contains("graft_dot"))
    assert(notAdd.as[Double].collect().toSet == Set(-32.0, -1.5))
    // integer multiply without the double casts (different result type)
    val intAgg = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
      .repartition(1)
      .select(aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L),
        (acc, v) => acc + v.cast("long")).as("d"))
    assert(!optimized(intAgg).contains("graft_dot"))
    assert(intAgg.as[Long].collect().toSeq == Seq(11L))
  }

  test("null semantics survive the rewrite: null array, null element, length mismatch") {
    val df = Seq(
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)),
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f)),
      (Seq[java.lang.Float](1f), Seq[java.lang.Float](3f, 4f)),
      (null, Seq[java.lang.Float](3f, 4f))
    ).toDF("a", "b").repartition(1).select(Similarity.dot($"a", $"b").as("d"))
    assert(optimized(df).contains("graft_dot"))
    val got = df.collect().map(r => Option(r.get(0))).toSeq
    assert(got.count(_.isEmpty) == 3 && got.contains(Some(11.0)))
  }
}
