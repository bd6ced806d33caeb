package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left time, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 110.0),
      (2L, ts("2024-01-01 11:00:00"), 50.0)
    ).toDF("key", "qts", "px")
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), "before-any"),
      (1L, ts("2024-01-01 10:00:00"), "equal-ts"),     // inclusive <= : matches 100.0
      (1L, ts("2024-01-01 11:30:00"), "between"),
      (1L, ts("2024-01-01 13:00:00"), "after-all"),
      (2L, ts("2024-01-01 12:00:00"), "other-key"),
      (3L, ts("2024-01-01 12:00:00"), "no-quotes")
    ).toDF("key", "ts", "tag")
    val out = AsOfJoin.asOf(events, quotes, Seq("key"), "ts", "qts", Seq("px"))
      .select($"tag", $"asof_px").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "before-any" -> None,
      "equal-ts" -> Some(100.0),
      "between" -> Some(100.0),
      "after-all" -> Some(110.0),
      "other-key" -> Some(50.0),
      "no-quotes" -> None))
  }

  test("a matched right row with a NULL payload field wins over older non-null rows") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0)),
      (1L, ts("2024-01-01 11:00:00"), None)        // latest row, null value
    ).toDF("key", "qts", "px")
    val events = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("key", "ts")
    val out = AsOfJoin.asOf(events, quotes, Seq("key"), "ts", "qts", Seq("px"))
      .select($"asof_px").as[Option[Double]].collect().toSeq
    // per-column last(ignoreNulls) would wrongly resurrect 100.0 here
    assert(out == Seq(None))
  }

  test("NULL right times and NULL keys never match (SQL ASOF semantics)") {
    val quotes = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 100.0),
      (Some(1L), None, 666.0),  // NULL time: would sort first and match everything if kept
      (None, Some(ts("2024-01-01 09:00:00")), 777.0) // NULL key: NULL must not match NULL
    ).toDF("key", "qts", "px")
    val events = Seq(
      (Some(1L), Some(ts("2024-01-01 09:30:00")), "before-real-quote"),
      (Some(1L), Some(ts("2024-01-01 10:30:00")), "after-real-quote"),
      (Some(1L), Option.empty[java.sql.Timestamp], "null-left-time"),
      (Option.empty[Long], Some(ts("2024-01-01 10:30:00")), "null-left-key")
    ).toDF("key", "ts", "tag")
    val out = AsOfJoin.asOf(events, quotes, Seq("key"), "ts", "qts", Seq("px"))
      .select($"tag", $"asof_px").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "before-real-quote" -> None,        // 666.0 must NOT leak in here
      "after-real-quote" -> Some(100.0),
      "null-left-time" -> None,           // a NULL instant has no "as of"
      "null-left-key" -> None))           // NULL key ≠ NULL key
  }

  test("multiple right payload columns travel together from the same matched row") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0, "NYSE"),
      (1L, ts("2024-01-01 11:00:00"), 110.0, "LSE")
    ).toDF("key", "qts", "px", "venue")
    val events = Seq((1L, ts("2024-01-01 11:30:00"))).toDF("key", "ts")
    val out = AsOfJoin.asOf(events, quotes, Seq("key"), "ts", "qts", Seq("px", "venue"))
      .select($"asof_px", $"asof_venue").as[(Double, String)].collect().toSeq
    assert(out == Seq((110.0, "LSE"))) // both fields from the 11:00 row
  }
}
