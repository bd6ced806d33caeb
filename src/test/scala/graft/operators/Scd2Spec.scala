package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("change log becomes half-open version intervals with one current row per key") {
    val chg = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (1L, ts("2024-02-01 00:00:00"), 2L, "silver"),
      (1L, ts("2024-03-01 00:00:00"), 3L, "gold"),
      (2L, ts("2024-01-15 00:00:00"), 4L, "bronze")
    ).toDF("uid", "ts", "eid", "tier")
    val out = Scd2.fromChangeLog(chg, Seq("uid"), "ts", Seq("tier"), Seq("eid"))
      .select($"uid", $"tier", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime)).toSeq
    assert(out == Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00")), false),
      (1L, "silver", ts("2024-02-01 00:00:00"), Some(ts("2024-03-01 00:00:00")), false),
      (1L, "gold",   ts("2024-03-01 00:00:00"), None, true),
      (2L, "bronze", ts("2024-01-15 00:00:00"), None, true)))
  }

  test("no-change versions collapse; valid_to chains to the next SURVIVING version") {
    val chg = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "a"),  // unchanged: collapsed away
      (1L, ts("2024-01-03 00:00:00"), 3L, "b")
    ).toDF("uid", "ts", "eid", "v")
    val out = Scd2.fromChangeLog(chg, Seq("uid"), "ts", Seq("v"), Seq("eid"))
      .select($"v", $"valid_from", $"valid_to")
      .as[(String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().sortBy(_._2.getTime).toSeq
    // 'a' runs 01-01 -> 01-03 (NOT 01-02: the collapsed row must not cut it)
    assert(out == Seq(
      ("a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00"))),
      ("b", ts("2024-01-03 00:00:00"), None)))
  }

  test("an attribute flipping to NULL and back is three versions (null-safe compare)") {
    val chg = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some("x")),
      (1L, ts("2024-01-02 00:00:00"), 2L, None),
      (1L, ts("2024-01-03 00:00:00"), 3L, None),      // unchanged NULL: collapsed
      (1L, ts("2024-01-04 00:00:00"), 4L, Some("x"))
    ).toDF("uid", "ts", "eid", "v")
    val out = Scd2.fromChangeLog(chg, Seq("uid"), "ts", Seq("v"), Seq("eid"))
      .select($"v", $"valid_from").as[(Option[String], java.sql.Timestamp)]
      .collect().sortBy(_._2.getTime).toSeq
    assert(out.map(_._1) == Seq(Some("x"), None, Some("x")))
  }

  test("collapseNoChange = false keeps every change row as a version") {
    val chg = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "a")
    ).toDF("uid", "ts", "eid", "v")
    assert(Scd2.fromChangeLog(chg, Seq("uid"), "ts", Seq("v"), Seq("eid"),
      collapseNoChange = false).count() == 2)
  }
}
