package graft.operators

import graft.SparkSpec
import java.nio.file.Files

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsertBatch: matched keys replaced, unmatched survive, new keys insert") {
    val target = Seq((1, "old1"), (2, "old2")).toDF("k", "v")
    val source = Seq((2, "new2"), (3, "new3")).toDF("k", "v")
    val out = Upsert.upsertBatch(target, source, Seq("k"))
      .as[(Int, String)].collect().toSet
    assert(out == Set((1, "old1"), (2, "new2"), (3, "new3")))
  }

  test("mergeIntoPath is idempotent and swaps atomically") {
    val path = Files.createTempDirectory("merge").toString + "/clean"
    val batch1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val batch2 = Seq((2, "B"), (3, "c")).toDF("k", "v")
    assert(Upsert.mergeIntoPath(spark, path, batch1, Seq("k")) == 2)
    assert(Upsert.mergeIntoPath(spark, path, batch2, Seq("k")) == 3)
    val after = spark.read.parquet(path).as[(Int, String)].collect().toSet
    assert(after == Set((1, "a"), (2, "B"), (3, "c")))
    // re-running the same batch changes nothing (L2 idempotency, SURVEY §5)
    assert(Upsert.mergeIntoPath(spark, path, batch2, Seq("k")) == 3)
    assert(spark.read.parquet(path).as[(Int, String)].collect().toSet == after)
  }

  private def partFiles(root: String, part: String): Map[String, Seq[Byte]] = {
    val dir = java.nio.file.Paths.get(root, part)
    val s = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> java.nio.file.Files.readAllBytes(p).toSeq)
        .toMap
    } finally s.close()
  }

  test("mergePartitionedPath rewrites ONLY affected partitions — untouched files byte-identical") {
    val path = Files.createTempDirectory("pmerge").toString + "/fact"
    val init = Seq((1, "2024-01-01", "a"), (2, "2024-01-02", "b"), (3, "2024-01-03", "c"))
      .toDF("k", "d", "v")
    assert(Upsert.mergePartitionedPath(spark, path, init, Seq("k"), "d") == 3)
    val before = partFiles(path, "d=2024-01-01")
    assert(before.nonEmpty)
    // batch touches ONLY 2024-01-02 (update) and 2024-01-04 (insert)
    val batch = Seq((2, "2024-01-02", "B"), (4, "2024-01-04", "x")).toDF("k", "d", "v")
    assert(Upsert.mergePartitionedPath(spark, path, batch, Seq("k"), "d") == 2)
    assert(spark.read.parquet(path).select($"k", $"v").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (3, "c"), (4, "x")))
    // the untouched partition was not rewritten: same file names, same bytes
    assert(partFiles(path, "d=2024-01-01") == before)
    // idempotency: re-running the same batch changes nothing
    assert(Upsert.mergePartitionedPath(spark, path, batch, Seq("k"), "d") == 2)
    assert(spark.read.parquet(path).select($"k", $"v").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (3, "c"), (4, "x")))
  }

  test("mergePartitionedPath moves a key whose partition value changed (no stale duplicate)") {
    val path = Files.createTempDirectory("pmerge-move").toString + "/fact"
    val init = Seq((1, "2024-01-01", "a"), (2, "2024-01-02", "b")).toDF("k", "d", "v")
    Upsert.mergePartitionedPath(spark, path, init, Seq("k"), "d")
    // key 1 MOVES from 01-01 to 02-01: the old partition held only this
    // row, so the merge must DELETE the emptied partition directory
    val move = Seq((1, "2024-02-01", "A")).toDF("k", "d", "v")
    assert(Upsert.mergePartitionedPath(spark, path, move, Seq("k"), "d") == 1)
    val rows = spark.read.parquet(path).select($"k", $"d", $"v")
      .as[(Int, String, String)].collect().toSet
    assert(rows == Set((1, "2024-02-01", "A"), (2, "2024-01-02", "b")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "d=2024-01-01")))
  }

  test("mergePartitionedPath fails loud past the partition budget") {
    val path = Files.createTempDirectory("pmerge-cap").toString + "/fact"
    val init = (1 to 8).map(i => (i, s"2024-01-0$i", "v")).toDF("k", "d", "v")
    Upsert.mergePartitionedPath(spark, path, init, Seq("k"), "d")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergePartitionedPath(spark, path, init, Seq("k"), "d", maxPartitions = 4)
    }
    assert(e.getMessage.contains("more than 4 partitions"))
  }
}
