package graft.operators

import graft.SparkSpec
import java.sql.Date
import org.apache.spark.sql.functions._

class GapfillSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("fills interior gaps per key with the last observed value") {
    val sparse = Seq(
      ("a", d("2024-01-01"), 10.0),
      ("a", d("2024-01-04"), 40.0), // gap: 01-02, 01-03
      ("b", d("2024-01-02"), 5.0),
      ("b", d("2024-01-03"), 6.0)   // no gaps
    ).toDF("k", "day", "v")
    val got = Gapfill.dailyLocf(sparse, Seq("k"), "day", Seq("v"))
      .orderBy($"k", $"day")
      .select($"k", date_format($"day", "yyyy-MM-dd"), $"v", $"is_gap")
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", "2024-01-01", 10.0, false),
      ("a", "2024-01-02", 10.0, true),
      ("a", "2024-01-03", 10.0, true),
      ("a", "2024-01-04", 40.0, false),
      ("b", "2024-01-02", 5.0, false),
      ("b", "2024-01-03", 6.0, false)))
  }

  test("spine is bounded by each key's own range — no cross-key bleed") {
    val sparse = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("b", d("2024-03-01"), 2.0),
      ("b", d("2024-03-03"), 3.0)
    ).toDF("k", "day", "v")
    val got = Gapfill.dailyLocf(sparse, Seq("k"), "day", Seq("v"))
    assert(got.count() == 4) // a: 1 day; b: 3 days — NOT jan..mar for both
    assert(got.filter($"k" === "a").count() == 1)
  }

  test("multiple value columns fill independently; NULL observed values carry the previous") {
    val sparse = Seq(
      ("a", d("2024-01-01"), Some(1.0), Some(10.0)),
      ("a", d("2024-01-03"), Some(3.0), None) // v2 NULL on an observed day
    ).toDF("k", "day", "v1", "v2")
    val got = Gapfill.dailyLocf(sparse, Seq("k"), "day", Seq("v1", "v2"))
      .orderBy($"day")
      .select($"v1", $"v2", $"is_gap").as[(Double, Double, Boolean)].collect().toSeq
    assert(got == Seq((1.0, 10.0, false), (1.0, 10.0, true), (3.0, 10.0, false)))
  }

  test("deterministic across partitionings; single-day keys produce one non-gap row") {
    val rows = (0 until 200).map(i =>
      (s"k${i % 7}", d(f"2024-01-${i % 28 + 1}%02d"), i.toDouble))
    val base = rows.toDF("k", "day", "v")
      .groupBy($"k", $"day").agg(sum($"v").as("v"))
    val a = Gapfill.dailyLocf(base, Seq("k"), "day", Seq("v"))
      .orderBy($"k", $"day").collect().toSeq
    val b = Gapfill.dailyLocf(base.repartition(13), Seq("k"), "day", Seq("v"))
      .orderBy($"k", $"day").collect().toSeq
    assert(a == b)
    val single = Seq(("x", d("2024-05-05"), 9.0)).toDF("k", "day", "v")
    val s = Gapfill.dailyLocf(single, Seq("k"), "day", Seq("v")).collect()
    assert(s.length == 1 && s(0).getAs[Boolean]("is_gap") == false)
  }

  test("empty input yields an empty spine; parameter validation fails fast") {
    val empty = Seq.empty[(String, Date, Double)].toDF("k", "day", "v")
    assert(Gapfill.dailyLocf(empty, Seq("k"), "day", Seq("v")).count() == 0)
    intercept[IllegalArgumentException](
      Gapfill.dailyLocf(empty, Seq.empty, "day", Seq("v")))
    intercept[IllegalArgumentException](
      Gapfill.dailyLocf(empty, Seq("k"), "day", Seq.empty))
  }
}
