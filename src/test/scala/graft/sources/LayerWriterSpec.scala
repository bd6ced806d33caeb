package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayerWriterSpec extends SparkSpec {
  import spark.implicits._

  test("writeFact partitions by date and reads prune partitions at plan time") {
    val dir = Files.createTempDirectory("fact").toString + "/t"
    val df = Seq(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-02", 3.0)).toDF("id", "d", "v")
    LayerWriter.writeFact(df, dir, "d")
    assert(new java.io.File(dir).list().exists(_.startsWith("d=2024-01-01")))
    val read = spark.read.parquet(dir).filter($"d" === "2024-01-02")
    assert(read.count() == 1)
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-02"))
  }

  test("overwriteBatchPartitions: re-running a batch is idempotent and preserves other dates") {
    val dir = Files.createTempDirectory("factdyn").toString + "/t"
    val day1 = Seq((1L, "2024-01-01", 1.0)).toDF("id", "d", "v")
    val day2 = Seq((2L, "2024-01-02", 2.0)).toDF("id", "d", "v")
    LayerWriter.writeFact(day1, dir, "d")
    LayerWriter.overwriteBatchPartitions(day2, dir, "d")
    LayerWriter.overwriteBatchPartitions(day2, dir, "d") // idempotent re-run
    val out = spark.read.parquet(dir).select($"id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("orc format: partitioned fact round-trips with partition pruning intact") {
    val dir = Files.createTempDirectory("factorc").toString + "/t"
    val df = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0)).toDF("id", "d", "v")
    LayerWriter.writeFact(df, dir, "d", format = "orc")
    val read = spark.read.orc(dir).filter($"d" === "2024-01-01")
    assert(read.count() == 1)
    assert(read.queryExecution.executedPlan.collectLeaves().head.toString
      .contains("PartitionFilters"))
  }

  test("writeDim produces a compact broadcastable directory") {
    val dir = Files.createTempDirectory("dim").toString + "/t"
    LayerWriter.writeDim(Seq((1, "x"), (2, "y")).toDF("k", "v"), dir)
    val files = new java.io.File(dir).list().count(_.endsWith(".parquet"))
    assert(files == 1)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("writeFact repartitions on the date: one writer owns each date (O(dates) files)") {
    val dir = Files.createTempDirectory("factfiles").toString + "/t"
    // many input partitions, two dates — without the internal
    // repartition every input partition would write both dates
    val df = spark.range(0, 400, 1, 8)
      .selectExpr("id", "CASE WHEN id % 2 = 0 THEN '2024-01-01' ELSE '2024-01-02' END AS d")
    LayerWriter.writeFact(df, dir, "d")
    Seq("2024-01-01", "2024-01-02").foreach { d =>
      val files = new java.io.File(s"$dir/d=$d").list().count(_.endsWith(".parquet"))
      assert(files == 1, s"date $d has $files files, expected 1")
    }
  }

  test("compactFact collapses accumulated small files to one per date, rows intact") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    // three append batches × several writer partitions = many small files
    (1 to 3).foreach { b =>
      spark.range(b * 100, b * 100 + 60, 1, 4)
        .selectExpr("id", "CASE WHEN id % 2 = 0 THEN '2024-01-01' ELSE '2024-01-02' END AS d")
        .write.mode("append").partitionBy("d").parquet(dir)
    }
    val rowsBefore = spark.read.parquet(dir).count()
    val (before, after) = LayerWriter.compactFact(spark, dir, "d")
    assert(before > 2 && after == 2, s"expected 2 compacted files, got $before -> $after")
    assert(spark.read.parquet(dir).count() == rowsBefore)
    // layout still prunes partitions after the rewrite
    val scan = spark.read.parquet(dir).filter($"d" === "2024-01-01")
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"))
  }

  test("compactFact crash recovery: a surviving .old-compact is restored and compaction converges") {
    val dir = Files.createTempDirectory("compact-crash").toString + "/t"
    (1 to 2).foreach { b =>
      spark.range(b * 100, b * 100 + 40, 1, 4)
        .selectExpr("id", "CASE WHEN id % 2 = 0 THEN '2024-01-01' ELSE '2024-01-02' END AS d")
        .write.mode("append").partitionBy("d").parquet(dir)
    }
    val rows = spark.read.parquet(dir).count()
    // simulate a crash between "target -> .old" and "tmp -> target"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".old-compact")))
    val (_, after) = LayerWriter.compactFact(spark, dir, "d")
    assert(after == 2, s"expected 2 compacted files, got $after")
    assert(spark.read.parquet(dir).count() == rows)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".old-compact")))
  }

  test("bucketed tables co-locate the join: no shuffle exchange on either side") {
    // dedicated child session: conf changes (broadcast threshold) must
    // not leak into plan-assertion tests running in parallel suites
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force the merge-join path
    try {
      val facts = s.range(0, 1000).selectExpr("id % 50 AS user_id", "id AS v")
      val dims = s.range(0, 50).selectExpr("id AS user_id", "id * 2 AS w")
      LayerWriter.writeBucketed(facts, "b_facts", "user_id", 8, Seq("user_id"))
      LayerWriter.writeBucketed(dims, "b_dims", "user_id", 8, Seq("user_id"))
      val joined = s.table("b_facts").join(s.table("b_dims"), "user_id")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(joined.count() == 1000)
    } finally {
      s.sql("DROP TABLE IF EXISTS b_facts")
      s.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("writeFact rebalance: a hot date splits across writers at the advisory size") {
    // child session with a tiny advisory size so the test's "hot date"
    // exceeds it — at production sizes this is the 10%-of-100TB date
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")
    val dir = Files.createTempDirectory("facthot").toString + "/t"
    val df = s.range(0, 20000, 1, 8)
      .selectExpr("id", "repeat('x', 32) AS pad", "'2024-01-01' AS d")
    LayerWriter.writeFact(df, dir, "d")
    val files = new java.io.File(s"$dir/d=2024-01-01").list().count(_.endsWith(".parquet"))
    assert(files > 1, s"hot date should split across writers, got $files file(s)")
    assert(s.read.parquet(dir).count() == 20000)
  }
}
