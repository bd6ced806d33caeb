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

  test("writeOrderedChunks: one file per chunk, ascending mtimes, empty chunk writes no dir") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ordered-chunks")
    val inDir = s"$dir/in"
    // 40 rows per chunk so a multi-partition source frame must still
    // land as ONE file per chunk (the repartition-on-_b guarantee —
    // coalesce(1)'s old one-task form gave this trivially; the
    // parallel-synthesis form must preserve it, because the stream
    // gates' chunk = micro-batch contract is one FILE per chunk)
    val chunks = Seq(
      spark.range(0, 40, 1, 4).select(col("id"), lit("a").as("tag")),
      spark.range(100, 140, 1, 4).select(col("id"), lit("b").as("tag")),
      spark.range(200, 200).select(col("id"), lit("c").as("tag")), // EMPTY
      spark.range(300, 340, 1, 4).select(col("id"), lit("d").as("tag")))
    writeOrderedChunks(inDir, chunks)
    def files(i: Int) = {
      val d = java.nio.file.Paths.get(inDir, s"_b=$i")
      if (!java.nio.file.Files.isDirectory(d)) Seq.empty
      else {
        val it = java.nio.file.Files.list(d).iterator()
        var out = List.empty[java.nio.file.Path]
        while (it.hasNext) { val f = it.next(); if (f.toString.endsWith(".parquet")) out ::= f }
        out
      }
    }
    assert(files(0).size == 1 && files(1).size == 1 && files(3).size == 1)
    assert(files(2).isEmpty, "empty chunk must write no partition dir")
    val m0 = java.nio.file.Files.getLastModifiedTime(files(0).head).toMillis
    val m1 = java.nio.file.Files.getLastModifiedTime(files(1).head).toMillis
    val m3 = java.nio.file.Files.getLastModifiedTime(files(3).head).toMillis
    assert(m0 < m1 && m1 < m3, "chunk mtimes must be strictly increasing")
    // round-trip: the streamed rows equal the union, with _b recoverable
    val back = spark.read.parquet(inDir)
    assert(back.count() == 120)
    assert(back.where(col("_b") === 1).agg(min(col("id")), max(col("id")))
      .as[(Long, Long)].head() == ((100L, 139L)))
    graft.sources.LocalFs.deleteRecursively(dir)
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

  test("upsertSink with partCol maintains a partitioned target; untouched partitions stay byte-identical") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-pupsert")
    val target = s"$dir/fact"
    val mem = MemoryStream[Event]
    val q = upsertSink(mem.toDF().withColumn("d", to_date($"ts")),
      target, s"$dir/ckpt", partCol = Some("d")).start()
    mem.addData(events(
      (1L, 1L, "view", "2024-01-01 10:00:00", 1.0),
      (2L, 2L, "buy", "2024-01-02 11:00:00", 2.0)): _*)
    q.processAllAvailable()
    val p1 = java.nio.file.Paths.get(target, "d=2024-01-01")
    def bytes(p: java.nio.file.Path): Map[String, Long] = {
      val s = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => f.getFileName.toString -> java.nio.file.Files.size(f)).toMap
      } finally s.close()
    }
    val before = bytes(p1)
    // second batch touches only 2024-01-02 (update) and 01-03 (insert)
    mem.addData(events(
      (2L, 2L, "buy", "2024-01-02 11:00:00", 99.0),
      (3L, 3L, "view", "2024-01-03 12:00:00", 3.0)): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(target).selectExpr("event_id", "value")
      .as[(Long, Double)].collect().toSet
    assert(out == Set((1L, 1.0), (2L, 99.0), (3L, 3.0)))
    assert(bytes(p1) == before) // 01-01's files were never rewritten
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

  test("stream_join_views SLICED branch: forced dispatch matches the batch interval-join replay") {
    // The catalog dispatch slices only above 200k events, so the
    // driver's sf0.01 oracle run exercises the FULL branch alone;
    // forcing sliceThreshold = 0 here drives the sliced branch through
    // the real file-source -> two-sided-state -> append-sink machinery
    // at sf0.01 and pins it against a plain batch interval join over
    // the identically sliced feeds (the oracle's own construction).
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val streamed = graft.analytics.DataOps
      .streamJoinViews(spark, dir, sliceThreshold = 0L)
      .collect().map(_.toString).sorted.toSeq
    val ev = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && pmod(col("user_id"), lit(5)) === 1)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"), col("value"))
    val expected = p.join(v, p("user_id") === v("user_id") &&
        col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") && col("vts") <= col("pts"))
      .groupBy(date_format(col("pts"), "yyyy-MM-dd").as("purchase_date"))
      .agg(count(lit(1)).as("n_matches"),
        countDistinct(col("pid")).as("n_purchases"),
        graft.functions.Cols.r(graft.functions.Cols.sumExact(col("value"), 2), 2).as("total_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty, "sliced branch produced no matches at sf0.01 — the spec lost its teeth")
    assert(streamed == expected)
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

  // ---- crash recovery: the failure mode production streams actually
  // face. The gates replay FILES through a live query; these two kill
  // the query between/inside batches and restart from the checkpoint.

  private def writeChunk(df: org.apache.spark.sql.DataFrame, inDir: String,
      mtime: Long, seen: scala.collection.mutable.Set[java.nio.file.Path]): Unit = {
    df.coalesce(1).write.mode("append").parquet(inDir)
    val it = java.nio.file.Files.list(java.nio.file.Paths.get(inDir)).iterator()
    while (it.hasNext) {
      val f = it.next()
      if (f.toString.endsWith(".parquet") && !seen.contains(f)) {
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(mtime))
        seen += f
      }
    }
  }

  test("restart from checkpoint: file sink stays exactly-once across a stop/restart boundary") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val work = graft.sources.LocalFs.scratchDir("stream-restart")
    val inDir = s"$work/in"; val target = s"$work/target"; val ckpt = s"$work/ckpt"
    val seen = scala.collection.mutable.Set[java.nio.file.Path]()
    val a = events((1L, 1L, "view", "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "view", "2024-01-01 10:05:00", 2.0)).toDF()
    val b = events((3L, 2L, "buy", "2024-01-01 11:00:00", 5.0)).toDF()
    def run(): Unit = {
      val q = spark.readStream.schema(a.schema).option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream.format("parquet").option("path", target)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    try {
      writeChunk(a, inDir, 1700000000000L, seen)
      run() // phase 1: only chunk A, then the query STOPS
      writeChunk(b, inDir, 1700000060000L, seen)
      run() // phase 2: restart from the same checkpoint picks up only B
      run() // phase 3: restart with nothing new must be a no-op
      val out = spark.read.parquet(target).select("event_id")
        .as[Long].collect().toSeq.sorted
      // each row exactly once: no loss across the stop, no replay of A
      assert(out == Seq(1L, 2L, 3L), s"got $out")
    } finally graft.sources.LocalFs.deleteRecursively(work)
  }

  test("crash inside a micro-batch: restart replays the uncommitted batch and the MERGE sink converges") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val work = graft.sources.LocalFs.scratchDir("stream-crash")
    val inDir = s"$work/in"; val target = s"$work/target"; val ckpt = s"$work/ckpt"
    val seen = scala.collection.mutable.Set[java.nio.file.Path]()
    val a = events((1L, 1L, "view", "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "view", "2024-01-01 10:05:00", 2.0)).toDF()
    // chunk B updates key 2 and adds key 3 — the batch the crash hits
    val b = events((2L, 1L, "view", "2024-01-01 10:05:00", 99.0),
      (3L, 2L, "buy", "2024-01-01 11:00:00", 5.0)).toDF()
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(): Unit = {
      val q = spark.readStream.schema(a.schema).option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          // injected fault: die BEFORE committing the second batch, once
          if (bid == 1 && !crashed.getAndSet(true))
            throw new RuntimeException("injected crash before batch-1 commit")
          graft.operators.Upsert.mergeIntoPath(batch.sparkSession, target, batch,
            Seq("event_id"))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    try {
      writeChunk(a, inDir, 1700000000000L, seen)
      writeChunk(b, inDir, 1700000060000L, seen)
      val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException](run())
      assert(boom.getMessage.contains("injected crash") ||
        Option(boom.getCause).exists(_.getMessage.contains("injected crash")))
      // batch 0 committed, batch 1 did not: the target must hold chunk
      // A intact and NOTHING from chunk B (no half-applied merge)
      val mid = spark.read.parquet(target).selectExpr("event_id", "value")
        .as[(Long, Double)].collect().toSet
      assert(mid == Set((1L, 1.0), (2L, 2.0)), s"got $mid")
      run() // restart from the checkpoint: batch 1 replays, MERGE converges
      val out = spark.read.parquet(target).selectExpr("event_id", "value")
        .as[(Long, Double)].collect().toSet
      assert(out == Set((1L, 1.0), (2L, 99.0), (3L, 5.0)), s"got $out")
    } finally graft.sources.LocalFs.deleteRecursively(work)
  }
}
