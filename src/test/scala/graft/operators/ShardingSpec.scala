package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")

  test("withShard is deterministic, in range, and reshuffles under a new seed") {
    val d = docs(200)
    val a = Sharding.withShard(d, "doc_id", 8, "epoch0")
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    val b = Sharding.withShard(d, "doc_id", 8, "epoch0")
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    assert(a == b, "same seed must reproduce the same assignment")
    assert(a.values.forall(s => s >= 0 && s < 8))
    val other = Sharding.withShard(d, "doc_id", 8, "epoch1")
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    assert(a != other, "a new seed must produce a different assignment")
  }

  test("hash sharding is balanced in expectation (no shard over 3x fair share at n=800)") {
    val counts = Sharding.withShard(docs(800), "doc_id", 8, "s")
      .groupBy($"shard").count().as[(Int, Long)].collect().toMap
    assert(counts.size == 8, s"all shards populated, got ${counts.keySet}")
    assert(counts.values.max <= 300, s"worst shard ${counts.values.max} of fair 100")
  }

  test("withPosition is 1..count and contiguous within every shard") {
    val sharded = Sharding.withShard(docs(300), "doc_id", 4, "s")
    val pos = Sharding.withPosition(sharded, "doc_id")
      .groupBy($"shard").agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"),
        countDistinct($"pos").as("d"))
      .as[(Int, Long, Int, Int, Long)].collect()
    pos.foreach { case (_, n, lo, hi, d) =>
      assert(lo == 1 && hi == n && d == n)
    }
  }

  test("hexPrefixValue folds hex chars exactly") {
    val out = Seq("ff0a", "0001", "abcdef").toDF("k")
      .select(Sharding.hexPrefixValue($"k", 4)).as[Long].collect()
    assert(out.toSeq == Seq(0xff0aL, 1L, 0xabcdL))
  }

  test("writeShards: concatenating shards in file order replays one global shuffled order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val d = docs(500)
    Sharding.writeShards(d, "doc_id", 5, "epoch0", dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getPath).sorted
    assert(files.length == 5, s"expected 5 shard files, got ${files.length}")
    // per-file okey ranges must be disjoint and file-ordered; within a
    // file rows are okey-sorted -> concatenation is globally sorted
    val perFile = files.map { f =>
      spark.read.parquet(f).select($"okey").as[String].collect()
    }
    perFile.foreach(ks => assert(ks.sameElements(ks.sorted), "shard not internally sorted"))
    val flat = perFile.flatten
    assert(flat.length == 500)
    assert(flat.sameElements(flat.sorted), "shard concatenation is not the global order")
    // determinism: a second write under the same seed produces the same order
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    Sharding.writeShards(d, "doc_id", 5, "epoch0", dir2)
    val again = new java.io.File(dir2).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
      .flatMap(f => spark.read.parquet(f).select($"okey").as[String].collect())
    assert(flat.sameElements(again), "same seed must replay the same global order")
    graft.sources.LocalFs.deleteRecursively(java.nio.file.Paths.get(dir))
    graft.sources.LocalFs.deleteRecursively(java.nio.file.Paths.get(dir2))
  }

  test("withShard rejects nShards <= 0; hexPrefixValue rejects out-of-range widths") {
    intercept[IllegalArgumentException](Sharding.withShard(docs(1), "doc_id", 0, "s"))
    intercept[IllegalArgumentException](Sharding.hexPrefixValue(lit("ab"), 0))
    intercept[IllegalArgumentException](Sharding.hexPrefixValue(lit("ab"), 16))
  }
}
