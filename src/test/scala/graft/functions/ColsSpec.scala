package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Specs for the scalar-function surface (SURVEY.md §2.7), including
  * every ⚠-flagged edge case from the survey: concat_ws NULL handling
  * in hash keys, pd.cut right-closed bin boundaries, TRY_* semantics,
  * and guarded ratios. */
class ColsSpec extends SparkSpec {
  import spark.implicits._

  test("cleanString trims and maps empty to NULL (F1+F2)") {
    val out = Seq("  x  ", "   ", "", null).toDF("s")
      .select(Cols.cleanString($"s")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("x"), None, None, None))
  }

  test("hashKey treats NULL parts as '' — reference COALESCE semantics, not concat_ws skipping (F4+F5)") {
    val df = Seq(("a", null: String), ("a", "")).toDF("x", "y")
    val keys = df.select(Cols.hashKey($"x", $"y")).as[String].collect()
    // NULL and '' must hash identically ("a|"), unlike bare concat_ws
    // which would skip the NULL arg and hash "a".
    assert(keys(0) == keys(1))
    val skipped = df.select(sha2(concat_ws("|", $"x", $"y"), 256)).as[String].collect()
    assert(keys(0) != skipped(0)) // proves the pre-coalesce matters
  }

  test("tryDecimal / tryNumber: NULL on garbage, round-half-up to scale 0 (F6+F7)") {
    val df = Seq("3.7", "abc", "2.4", "-1.5").toDF("s")
    assert(df.select(Cols.tryNumber($"s").cast("string")).as[Option[String]].collect().toSeq
      == Seq(Some("4"), None, Some("2"), Some("-2")))
    assert(df.select(Cols.tryDecimal($"s", 18, 2).cast("string")).as[Option[String]].collect().toSeq
      == Seq(Some("3.70"), None, Some("2.40"), Some("-1.50")))
  }

  test("marketCapCategory: right-closed pd.cut bins — 2e9 is Small, 1e10 is Mid (F20)") {
    val df = Seq[Option[Double]](Some(2e9), Some(2e9 + 1), Some(1e10), Some(1e10 + 1), None)
      .toDF("cap")
    val out = df.select(Cols.marketCapCategory($"cap")).as[String].collect().toSeq
    assert(out == Seq("Small", "Mid", "Mid", "Large", "Unknown"))
  }

  test("guardedRatio and zScore return NULL on zero/NULL denominators (F16)") {
    val df = Seq((10.0, 0.0), (10.0, 2.0)).toDF("n", "d")
    assert(df.select(Cols.guardedRatio($"n", $"d")).as[Option[Double]].collect().toSeq
      == Seq(None, Some(5.0)))
    assert(df.select(Cols.zScore($"n", lit(4.0), $"d")).as[Option[Double]].collect().toSeq
      == Seq(None, Some(3.0)))
  }

  test("r: portable round-half-up") {
    val df = Seq(1.23455, -0.5, 2.5).toDF("x")
    assert(df.select(Cols.r($"x" * 10, 0)).as[Double].collect().toSeq == Seq(12.0, -5.0, 25.0))
    assert(math.abs(df.select(Cols.r($"x", 4)).as[Double].collect().head - 1.2346) < 1e-12)
  }

  test("sumExact/avgExact/stddevExact match closed forms and ignore NULLs") {
    val df = Seq[Option[Double]](Some(1.25), Some(2.75), Some(4.0), None).toDF("x")
    val Row(s: Double, a: Double, sd: Double) = df.agg(
      Cols.sumExact($"x", 2), Cols.avgExact($"x", 2), Cols.stddevExact($"x", 2)).head
    assert(s == 8.0 && a == 8.0 / 3)
    // sample stddev of {1.25, 2.75, 4.0}
    val m = 8.0 / 3
    val expected = math.sqrt(Seq(1.25, 2.75, 4.0).map(v => (v - m) * (v - m)).sum / 2)
    assert(math.abs(sd - expected) < 1e-9)
  }
}
