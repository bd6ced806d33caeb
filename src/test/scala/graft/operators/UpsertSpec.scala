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
}
