package graft.streaming

import graft.SparkSpec
import graft.operators.{HeavyHitters, Sketches, TopK}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** The bounded-state aggregators (KMV sketch, top-k heap, Misra–Gries
  * summary) claim "works unchanged in Structured Streaming" in their
  * scaladocs — this spec substantiates it: each runs inside a
  * windowed streaming groupBy over a MemoryStream, across MULTIPLE
  * micro-batches (so state merges batch-to-batch through the state
  * store), and the settled result equals the same aggregation run in
  * batch over the union of the inputs. That equality is exactly the
  * property that makes them deployable in a production stream: O(k)
  * state per window, merge-order independence. */
class StreamingAggregatorsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val batch1 = Seq(
    (ts("2024-01-01 10:05:00"), 1L, 5.0, "a"),
    (ts("2024-01-01 10:10:00"), 2L, 9.0, "a"),
    (ts("2024-01-01 10:20:00"), 3L, 9.0, "b"),
    (ts("2024-01-01 11:05:00"), 4L, 1.0, "a"))
  private val batch2 = Seq(
    (ts("2024-01-01 10:30:00"), 5L, 7.0, "a"),
    (ts("2024-01-01 10:40:00"), 2L, 3.0, "a"),
    (ts("2024-01-01 11:10:00"), 6L, 2.0, "b"),
    (ts("2024-01-01 11:20:00"), 7L, 2.0, "b"))

  private def run(agg: org.apache.spark.sql.Column): (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, Double, String)]
    val df = mem.toDF().toDF("ts", "id", "v", "s")
    val name = s"sa_${System.nanoTime()}"
    val q = df.groupBy(window(col("ts"), "1 hour").getField("start").as("w"))
      .agg(agg.as("out"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    val streamed = spark.table(name).orderBy(col("w")).collect().toSeq
    q.stop()
    val batch = (batch1 ++ batch2).toDF("ts", "id", "v", "s")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w"))
      .agg(agg.as("out")).orderBy(col("w")).collect().toSeq
    (streamed, batch)
  }

  test("KMV sketch aggregates per window across micro-batches == batch run") {
    val kmv = udaf(Sketches.kmvAgg(8))
    val (s, b) = run(kmv(col("id")))
    assert(s == b && s.size == 2)
  }

  test("top-k heap aggregates per window across micro-batches == batch run") {
    val topk = udaf(TopK.topKAgg(2))
    val (s, b) = run(topk(col("v"), col("id")))
    assert(s == b && s.size == 2)
    // window 10:00 holds ids 1,2,3,5,2' with values 5,9,9,7,3 → top2 = (9,2),(9,3)
    val w10 = s.head.getSeq[org.apache.spark.sql.Row](1)
    assert(w10.map(r => (r.getDouble(0), r.getLong(1))) == Seq((9.0, 2L), (9.0, 3L)))
  }

  test("Misra-Gries summary aggregates per window across micro-batches, guarantee intact") {
    val mg = udaf(HeavyHitters.mgAgg(2))
    val (s, _) = run(mg(col("s")))
    assert(s.size == 2)
    // per-window majority items survive: 'a' dominates 10:00 (4 of 5),
    // 'b' dominates 11:00 (3 of 4) — both above n/(k+1) = n/3
    val m10 = s.head.getMap[String, Long](1)
    val m11 = s(1).getMap[String, Long](1)
    assert(m10.contains("a"), m10.toString)
    assert(m11.contains("b"), m11.toString)
  }
}
