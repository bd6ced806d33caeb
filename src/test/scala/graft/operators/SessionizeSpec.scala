package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessions split at the gap boundary (session_window's half-open convention)") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:29:59"), 2L),  // inside [10:00, 10:30): same session
      (1L, ts("2024-01-01 10:59:58"), 3L),  // 29:59 later: inside the window, still same
      (1L, ts("2024-01-01 11:29:58"), 4L),  // gap = exactly 30 min: NEW session
      (2L, ts("2024-01-01 10:00:00"), 5L)   // other key: independent numbering
    ).toDF("user_id", "ts", "event_id")
    val out = Sessionize.withSessionIds(ev, "user_id", "ts", gapSeconds = 1800,
        tiebreakCols = Seq("event_id"))
      .select($"event_id", $"session_id").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "1-1", 2L -> "1-1", 3L -> "1-1", 4L -> "1-2", 5L -> "2-1"))
  }

  test("batch sessionize cuts sessions exactly where streaming session_window does") {
    val rng = new scala.util.Random(31)
    var t = 0L
    val rows = (1L to 120L).map { i =>
      // jumps straddle the 30-min boundary, including exact 30:00 gaps
      t += (rng.nextInt(4) match {
        case 0 => 60L          // 1 min: same session
        case 1 => 1799L        // just under the gap
        case 2 => 1800L        // exactly the gap: new session
        case _ => 7200L        // way over
      }) * 1000000L
      (1L + i % 3, new java.sql.Timestamp(1704067200000L + t / 1000L), i, i * 0.5)
    }
    val ev = rows.toDF("user_id", "ts", "event_id", "value")
    val batch = Sessionize.sessions(ev, "user_id", "ts", 1800, Seq("event_id"))
      .select($"user_id", $"session_start", $"n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val streaming = graft.streaming.Streams.userSessions(ev, gap = "30 minutes")
      .select($"user_id", $"session_start", $"n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(batch == streaming)
    assert(batch.nonEmpty)
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
