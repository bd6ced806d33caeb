package graft.quality

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("notNull / unique / acceptedValues on fixtures") {
    val df = Seq((Some(1), "x"), (None, "x"), (Some(3), "y")).toDF("k", "v")
    assert(DataQuality.notNull(df, "k") == 1)
    assert(DataQuality.unique(df, "v") == 1)  // "x" appears twice
    assert(DataQuality.acceptedValues(df, "v", Seq("x")) == 1)
  }

  test("relationships: harness star schema has intact foreign keys") {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    assert(DataQuality.relationships(li, "l_orderkey", o, "o_orderkey") == 0)
    assert(DataQuality.relationships(o, "o_custkey", c, "c_custkey") == 0)
  }

  test("conditionalCounts evaluates a QA suite in one aggregate pass") {
    val df = Seq(("", "1"), ("a", "x"), ("b", "2")).toDF("s", "n")
    val out = DataQuality.conditionalCounts(df, Map(
      "blank_s" -> (trim($"s") === ""),
      "unparseable_n" -> ($"n".isNotNull && $"n".try_cast("double").isNull)))
    assert(out == Map("blank_s" -> 1L, "unparseable_n" -> 1L))
  }

  test("runAll returns only failing checks") {
    val df = Seq((1, "x")).toDF("k", "v")
    val report = DataQuality.runAll(Map(
      "k_not_null" -> (() => DataQuality.notNull(df, "k")),
      "v_accepted" -> (() => DataQuality.acceptedValues(df, "v", Seq("z")))))
    assert(report == Map("v_accepted" -> 1L))
  }
}
