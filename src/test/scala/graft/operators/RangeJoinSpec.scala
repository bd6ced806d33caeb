package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val H = 3600L * 1000000L // one hour in micros

  test("within finds exactly the in-window pairs, boundaries inclusive, across bucket edges") {
    val purchases = Seq(
      (1L, 100L, ts("2024-01-01 12:00:00")),
      (2L, 101L, ts("2024-01-01 00:30:00"))  // window straddles midnight bucket edge
    ).toDF("user_id", "pid", "pts")
    val views = Seq(
      (1L, 200L, ts("2024-01-01 11:00:00")), // exactly pts - 1h: included
      (1L, 201L, ts("2024-01-01 11:59:59")),
      (1L, 202L, ts("2024-01-01 12:00:00")), // equal: included (after = 0)
      (1L, 203L, ts("2024-01-01 12:00:01")), // past: out
      (1L, 204L, ts("2024-01-01 10:59:59")), // too early: out
      (2L, 205L, ts("2023-12-31 23:45:00")), // previous day, in window
      (3L, 206L, ts("2024-01-01 11:30:00"))  // other key: out
    ).toDF("user_id", "vid", "vts")
    val out = RangeJoin.within(purchases, views, Seq("user_id"), "pts", "vts", beforeUs = H)
      .select($"pid", $"r_vid").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 200L), (100L, 201L), (100L, 202L), (101L, 205L)))
  }

  test("no duplicate pairs: each match appears exactly once despite left bucket explosion") {
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("user_id", "pid", "pts")
    val right = Seq((1L, 20L, ts("2024-01-01 11:30:00"))).toDF("user_id", "vid", "vts")
    val out = RangeJoin.within(left, right, Seq("user_id"), "pts", "vts", beforeUs = H)
    assert(out.count() == 1)
  }

  test("symmetric window (before and after) and custom bucket width agree with brute force") {
    val rng = new scala.util.Random(31)
    val base = ts("2024-01-01 00:00:00").getTime
    def randTs() = new java.sql.Timestamp(base + rng.nextInt(48 * 3600) * 1000L)
    val l = (0L until 60L).map(i => (i % 5, i, randTs())).toDF("k", "lid", "lt")
    val r = (0L until 80L).map(i => (i % 5, i, randTs())).toDF("k", "rid", "rt")
    val got = RangeJoin.within(l, r, Seq("k"), "lt", "rt",
        beforeUs = 2 * H, afterUs = H, widthUs = H / 2)
      .select($"lid", $"r_rid").as[(Long, Long)].collect().toSet
    val brute = l.as("l").join(r.as("r"), $"l.k" === $"r.k" &&
        unix_micros($"r.rt") >= unix_micros($"l.lt") - 2 * H &&
        unix_micros($"r.rt") <= unix_micros($"l.lt") + H)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(brute.nonEmpty)
  }
}
