package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessions split on gaps STRICTLY greater than the threshold, per key") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L),  // gap = exactly 30 min: same session
      (1L, ts("2024-01-01 11:00:01"), 3L),  // gap = 30:01: NEW session
      (1L, ts("2024-01-01 11:10:00"), 4L),
      (2L, ts("2024-01-01 10:00:00"), 5L)   // other key: independent numbering
    ).toDF("user_id", "ts", "event_id")
    val out = Sessionize.withSessionIds(ev, "user_id", "ts", gapSeconds = 1800,
        tiebreakCols = Seq("event_id"))
      .select($"event_id", $"session_id").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "1-1", 2L -> "1-1", 3L -> "1-2", 4L -> "1-2", 5L -> "2-1"))
  }

  test("sessions: start/end/count/duration per session, exact microseconds") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:05:30"), 2L),
      (1L, ts("2024-01-01 12:00:00"), 3L)
    ).toDF("user_id", "ts", "event_id")
    val out = Sessionize.sessions(ev, "user_id", "ts", 1800, Seq("event_id"))
      .select($"session_seq", $"n_events", $"duration_us")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 330000000L), (2L, 1L, 0L)))
  }

  test("equal timestamps order by the tiebreak column, not nondeterministically") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (1L, ts("2024-01-01 10:00:00"), 3L)
    ).toDF("user_id", "ts", "event_id")
    val out = Sessionize.withSessionIds(ev, "user_id", "ts", 60, Seq("event_id"))
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    // both in one session regardless of order; the point is it's stable
    assert(out == Map(3L -> 1L, 7L -> 1L))
  }
}
