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
}
