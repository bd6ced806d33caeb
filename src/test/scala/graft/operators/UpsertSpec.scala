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

  // every FileSourceScanExec in an executed plan, through AQE wrappers
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => fileScans(q.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => (other.children ++ other.subqueries).flatMap(fileScans)
  }

  test("key-range index bounds the matched-key probe: untouched partitions are never read") {
    val path = Files.createTempDirectory("pmerge-probe").toString + "/fact"
    // four partitions with disjoint key ranges, one data file each
    val init = Seq((1, "d1", "a"), (2, "d1", "a2"), (11, "d2", "b"),
      (21, "d3", "c"), (31, "d4", "e")).toDF("k", "d", "v").repartition(1)
    assert(Upsert.mergePartitionedPath(spark, path, init, Seq("k"), "d") == 5)
    // input-file accounting: capture every scan over the target that
    // any query during the second merge actually executed
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        fileScans(qe.executedPlan).foreach { s =>
          s.relation.location.rootPaths.foreach(rp =>
            seen.add(rp.toUri.getPath -> s.metrics("numFiles").value))
        }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // batch updates one key inside d2's range: the index must prune
      // the probe (and everything else) to that single partition
      val batch = Seq((11, "d2", "B")).toDF("k", "d", "v")
      assert(Upsert.mergePartitionedPath(spark, path, batch, Seq("k"), "d") == 1)
      // listener events are async — wait for the target scans to land
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def targetScans = seen.toArray(Array.empty[(String, Long)]).filter(_._1 == path)
      while (targetScans.length < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      val scans = targetScans
      assert(scans.nonEmpty, "expected at least one accounted scan over the target")
      // 4 partition dirs × 1 file: any scan reading >1 file read an
      // untouched partition
      assert(scans.forall(_._2 <= 1), s"a merge scan read untouched partitions: $scans")
    } finally spark.listenerManager.unregister(listener)
    assert(spark.read.parquet(path).select($"k", $"v").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "a2"), (11, "B"), (21, "c"), (31, "e")))
  }

  test("a missing or stale key index degrades to the full probe and is rebuilt") {
    val path = Files.createTempDirectory("pmerge-noidx").toString + "/fact"
    val init = Seq((1, "d1", "a"), (11, "d2", "b")).toDF("k", "d", "v")
    Upsert.mergePartitionedPath(spark, path, init, Seq("k"), "d")
    // simulate an external writer that dropped the index
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(path + "/_keyidx"), true))
    val batch = Seq((11, "d2", "B"), (21, "d3", "c")).toDF("k", "d", "v")
    assert(Upsert.mergePartitionedPath(spark, path, batch, Seq("k"), "d") == 2)
    assert(spark.read.parquet(path).select($"k", $"v").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (11, "B"), (21, "c")))
    // the fallback merge rebuilt the index for the next batch
    assert(fs.exists(new org.apache.hadoop.fs.Path(path + "/_keyidx")))
  }

  test("mergeIntoPath crash recovery: a surviving .old-merge is restored and the merge converges") {
    val path = Files.createTempDirectory("merge-crash").toString + "/clean"
    val batch1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Upsert.mergeIntoPath(spark, path, batch1, Seq("k"))
    // simulate a crash between "target -> .old" and "tmp -> target":
    // the target is gone, the previous state survives at .old-merge
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".old-merge")))
    val batch2 = Seq((2, "B"), (3, "c")).toDF("k", "v")
    assert(Upsert.mergeIntoPath(spark, path, batch2, Seq("k")) == 3)
    assert(spark.read.parquet(path).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (3, "c")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".old-merge")))
  }

  test("swap layer runs through the Hadoop FileSystem API on an explicit file: URI") {
    // the scheme-qualified form a cluster deployment would pass
    // (hdfs://..., s3a://...) — locally `file:` resolves to Hadoop's
    // LocalFileSystem through the exact same SwapFs code path
    val dir = Files.createTempDirectory("merge-uri")
    val path = "file://" + dir.toString + "/clean"
    val batch1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val batch2 = Seq((2, "B"), (3, "c")).toDF("k", "v")
    assert(Upsert.mergeIntoPath(spark, path, batch1, Seq("k")) == 2)
    assert(Upsert.mergeIntoPath(spark, path, batch2, Seq("k")) == 3)
    assert(spark.read.parquet(path).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (3, "c")))
  }

  test("mergePartitionedPath crash recovery: a mid-swap .old-pmerge leftover is restored, no rows lost") {
    val path = Files.createTempDirectory("pmerge-crash").toString + "/fact"
    val init = Seq((1, "2024-01-01", "a"), (2, "2024-01-01", "b"), (3, "2024-01-02", "c"))
      .toDF("k", "d", "v")
    Upsert.mergePartitionedPath(spark, path, init, Seq("k"), "d")
    // simulate a crash between "dst -> .old-pmerge" and "tmp -> dst":
    // the live partition is gone; its pre-merge rows survive only in
    // the leftover. The key index still exists and knows nothing of
    // the leftover — a pruned rerun must NOT lose key 1.
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path, "d=2024-01-01"),
      new org.apache.hadoop.fs.Path(path, "d=2024-01-01.old-pmerge")))
    val batch = Seq((2, "2024-01-01", "B")).toDF("k", "d", "v")
    assert(Upsert.mergePartitionedPath(spark, path, batch, Seq("k"), "d") == 2)
    assert(spark.read.parquet(path).select($"k", $"d".cast("string"), $"v")
      .as[(Int, String, String)].collect().toSet ==
      Set((1, "2024-01-01", "a"), (2, "2024-01-01", "B"), (3, "2024-01-02", "c")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "d=2024-01-01.old-pmerge")))
    // the other window: install completed, leftover not yet dropped
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "d=2024-01-02.old-pmerge"))
    assert(Upsert.mergePartitionedPath(spark, path, batch, Seq("k"), "d") == 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "d=2024-01-02.old-pmerge")))
  }

  test("mergePartitionedPath works on an explicit file: URI (scheme-qualified cluster form)") {
    val dir = Files.createTempDirectory("pmerge-uri")
    val path = "file://" + dir.toString + "/fact"
    val init = Seq((1, "2024-01-01", "a"), (2, "2024-01-02", "b")).toDF("k", "d", "v")
    assert(Upsert.mergePartitionedPath(spark, path, init, Seq("k"), "d") == 2)
    val batch = Seq((2, "2024-01-02", "B"), (3, "2024-01-03", "c")).toDF("k", "d", "v")
    assert(Upsert.mergePartitionedPath(spark, path, batch, Seq("k"), "d") == 2)
    assert(spark.read.parquet(path).select($"k", $"v").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (3, "c")))
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
