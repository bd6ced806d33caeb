package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import Streams._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, Long, String, String, Double)*): Seq[Event] =
    rows.map { case (id, uid, tpe, t, v) => Event(id, uid, tpe, ts(t), v) }

  test("hourlyRollup aggregates tumbling windows over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = hourlyRollup(mem.toDF(), delay = "0 seconds")
      .writeStream.format("memory").queryName("hr").outputMode(OutputMode.Complete()).start()
    mem.addData(events(
      (1L, 1L, "view", "2024-01-01 10:05:00", 1.0),
      (2L, 1L, "view", "2024-01-01 10:55:00", 2.0),
      (3L, 2L, "buy", "2024-01-01 11:05:00", 10.0)): _*)
    q.processAllAvailable()
    val out = spark.table("hr").as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(out == Set(("2024-01-01 10:00", 2L, 3.0), ("2024-01-01 11:00", 1L, 10.0)))
  }

  test("dedupedStream drops repeated event ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = dedupedStream(mem.toDF(), delay = "0 seconds")
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append()).start()
    mem.addData(events(
      (1L, 1L, "view", "2024-01-01 10:00:00", 1.0),
      (1L, 1L, "view", "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "view", "2024-01-01 10:01:00", 2.0)): _*)
    q.processAllAvailable()
    val n = spark.table("dd").count()
    q.stop()
    assert(n == 2)
  }

  test("dedupedByContent drops re-posted normalized text; fingerprints expire after the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val docs = mem.toDF().toDF("ts", "text")
    val q = dedupedByContent(docs, delay = "1 hour")
      .writeStream.format("memory").queryName("dc").outputMode(OutputMode.Append()).start()
    // same normalized fingerprint ("Hello  World" ≡ "hello world") → one survives
    mem.addData(
      (ts("2024-01-01 10:00:00"), "Hello  World"),
      (ts("2024-01-01 10:00:10"), "hello world"),
      (ts("2024-01-01 10:00:20"), "other doc"))
    q.processAllAvailable()
    // advance the watermark past 10:00 + 1h so the fingerprint state expires
    mem.addData((ts("2024-01-01 13:00:00"), "advance"))
    q.processAllAvailable()
    // the same content after the horizon is NEW (state was expired, not leaked)
    mem.addData((ts("2024-01-01 12:30:00"), "hello world"))
    q.processAllAvailable()
    val texts = spark.table("dc").select("text").as[String].collect().toSeq
    q.stop()
    assert(texts.count(_.toLowerCase.startsWith("hello")) == 2)
    assert(texts.contains("other doc") && texts.contains("advance"))
  }

  test("upsertSink merges each micro-batch into parquet, latest batch wins per key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-upsert")
    val target = s"$dir/clean"
    val mem = MemoryStream[Event]
    val q = upsertSink(mem.toDF(), target, s"$dir/ckpt").start()
    mem.addData(events((1L, 1L, "view", "2024-01-01 10:00:00", 1.0)): _*)
    q.processAllAvailable()
    mem.addData(events(
      (1L, 1L, "view", "2024-01-01 10:00:00", 99.0), // same key, new value
      (2L, 2L, "buy", "2024-01-01 11:00:00", 5.0)): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(target).selectExpr("event_id", "value")
      .as[(Long, Double)].collect().toSet
    assert(out == Set((1L, 99.0), (2L, 5.0)))
  }

  test("userActivity accumulates keyed state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = userActivity(mem.toDS())
      .writeStream.format("memory").queryName("ua").outputMode(OutputMode.Update()).start()
    mem.addData(events((1L, 7L, "view", "2024-01-01 10:00:00", 1.5)): _*)
    q.processAllAvailable()
    mem.addData(events((2L, 7L, "view", "2024-01-01 12:00:00", 2.5)): _*)
    q.processAllAvailable()
    val state = spark.table("ua").as[UserActivity].collect()
      .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n_events) }
    q.stop()
    assert(state(7L).n_events == 2 && state(7L).total_value == 4.0)
    assert(state(7L).last_seen == ts("2024-01-01 12:00:00"))
  }

  test("userSessions merges events within the gap and splits across it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = userSessions(mem.toDF(), gap = "30 minutes", delay = "0 seconds")
      .writeStream.format("memory").queryName("us").outputMode(OutputMode.Complete()).start()
    mem.addData(events(
      (1L, 1L, "view", "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "view", "2024-01-01 10:20:00", 2.0),  // same session (gap 20m)
      (3L, 1L, "view", "2024-01-01 12:00:00", 4.0),  // new session
      (4L, 2L, "buy", "2024-01-01 10:05:00", 8.0)): _*)
    q.processAllAvailable()
    val out = spark.table("us")
      .selectExpr("user_id", "n_events", "total_value").as[(Long, Long, Double)]
      .collect().toSet
    q.stop()
    assert(out == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("viewPurchaseJoin pairs views with purchases within the window, stream-stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vMem = MemoryStream[Event]
    val pMem = MemoryStream[Event]
    val q = viewPurchaseJoin(vMem.toDF(), pMem.toDF(), window = "1 hour", delay = "0 seconds")
      .writeStream.format("memory").queryName("vpj").outputMode(OutputMode.Append()).start()
    vMem.addData(events(
      (1L, 1L, "view", "2024-01-01 11:30:00", 0.0),   // in window of purchase 100
      (2L, 1L, "view", "2024-01-01 10:59:59", 0.0),   // 1s too early: out
      (3L, 2L, "view", "2024-01-01 11:45:00", 0.0)): _*) // other user: out
    pMem.addData(events(
      (100L, 1L, "purchase", "2024-01-01 12:00:00", 9.99)): _*)
    q.processAllAvailable()
    val out = spark.table("vpj")
      .select($"user_id", $"purchase_id", date_format($"view_ts", "HH:mm:ss"))
      .as[(Long, Long, String)].collect().toSet
    q.stop()
    assert(out == Set((1L, 100L, "11:30:00")))
  }

  test("closedSessions emits only on close: gap jump in-line, idle timeout at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = closedSessions(mem.toDS(), gapMs = 30L * 60 * 1000, delay = "1 hour")
      .writeStream.format("memory").queryName("cs").outputMode(OutputMode.Append()).start()
    // one session: 10:00 + 10:10; nothing closed yet
    mem.addData(events(
      (1L, 7L, "view", "2024-01-01 10:00:00", 1.0),
      (2L, 7L, "view", "2024-01-01 10:10:00", 2.0)): _*)
    q.processAllAvailable()
    assert(spark.table("cs").count() == 0, "open session must not emit")
    // 12:00 jumps the 30-min gap -> first session closes in-line
    mem.addData(events((3L, 7L, "view", "2024-01-01 12:00:00", 5.0)): _*)
    q.processAllAvailable()
    val first = spark.table("cs").as[SessionSummary].collect()
    assert(first.length == 1)
    assert(first.head.session_start == ts("2024-01-01 10:00:00") &&
      first.head.session_end == ts("2024-01-01 10:10:00") &&
      first.head.n_events == 2 && first.head.total_value == 3.0)
    // another user's 15:00 event pushes the watermark to 14:00,
    // past 12:00 + gap -> the idle session times out and emits
    mem.addData(events((4L, 9L, "view", "2024-01-01 15:00:00", 1.0)): _*)
    q.processAllAvailable()
    // one more empty batch lets the timeout fire after the watermark update
    mem.addData(events((5L, 9L, "view", "2024-01-01 15:01:00", 1.0)): _*)
    q.processAllAvailable()
    val all = spark.table("cs").as[SessionSummary].collect()
    q.stop()
    val u7 = all.filter(_.user_id == 7L).sortBy(_.session_start.getTime)
    assert(u7.length == 2, s"expected both u7 sessions closed, got ${all.toSeq}")
    assert(u7(1).session_start == ts("2024-01-01 12:00:00") &&
      u7(1).n_events == 1 && u7(1).total_value == 5.0)
  }

  test("closedSessions boundary: a diff of exactly the gap starts a new session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = closedSessions(mem.toDS(), gapMs = 30L * 60 * 1000, delay = "1 hour")
      .writeStream.format("memory").queryName("csb").outputMode(OutputMode.Append()).start()
    mem.addData(events(
      (1L, 7L, "view", "2024-01-01 10:00:00", 1.0),
      (2L, 7L, "view", "2024-01-01 10:30:00", 2.0)): _*) // exactly gap apart
    q.processAllAvailable()
    val closed = spark.table("csb").as[SessionSummary].collect()
    q.stop()
    // the 10:30 event opened a NEW session, closing the 10:00 one
    assert(closed.length == 1)
    assert(closed.head.session_start == ts("2024-01-01 10:00:00") &&
      closed.head.session_end == ts("2024-01-01 10:00:00") &&
      closed.head.n_events == 1)
  }
}
