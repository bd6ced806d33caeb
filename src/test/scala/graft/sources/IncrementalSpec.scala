package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def freshTarget = Files.createTempDirectory("incr").toString + "/t"

  test("first load takes everything; later loads take only rows past the watermark") {
    val target = freshTarget
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("seq", "v")
    val b2 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("seq", "v")
    assert(Incremental.appendSince(spark, target, b1, "seq") == 2)
    assert(Incremental.watermark(spark, target, "seq").contains(2L))
    assert(Incremental.appendSince(spark, target, b2, "seq") == 2) // only 3, 4
    assert(spark.read.parquet(target).count() == 4)
  }

  test("re-running the same feed appends zero rows (idempotent)") {
    val target = freshTarget
    val feed = Seq((10L, "x"), (11L, "y")).toDF("seq", "v")
    assert(Incremental.appendSince(spark, target, feed, "seq") == 2)
    assert(Incremental.appendSince(spark, target, feed, "seq") == 0)
    assert(spark.read.parquet(target).as[(Long, String)].collect().toSet ==
      Set((10L, "x"), (11L, "y")))
  }

  test("boundary rows at exactly the watermark are skipped (strictly-greater semantics)") {
    val target = freshTarget
    Incremental.appendSince(spark, target, Seq((5L, "a")).toDF("seq", "v"), "seq")
    // a DIFFERENT row sharing the watermark value must not load — this
    // is why tie-prone watermarks need a monotonic unique column
    assert(Incremental.appendSince(spark, target,
      Seq((5L, "other")).toDF("seq", "v"), "seq") == 0)
  }

  test("timestamp watermarks work end to end") {
    val target = freshTarget
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b1 = Seq((ts("2024-01-01 10:00:00"), 1L)).toDF("wm", "id")
    val b2 = Seq((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 11:00:00"), 2L))
      .toDF("wm", "id")
    assert(Incremental.appendSince(spark, target, b1, "wm") == 1)
    assert(Incremental.appendSince(spark, target, b2, "wm") == 1)
    assert(spark.read.parquet(target).count() == 2)
  }
}
