package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PassagesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h leftover"),     // passages (w=4): "a b c d", "e f g h"; trailing word dropped
    (2L, "a b c d x y z w"),              // shares "a b c d" with doc 1
    (3L, "a b c")                          // < w tokens: no passages
  ).toDF("doc_id", "text")

  test("withPassages: fixed windows, stride w, trailing partial and short docs dropped") {
    val out = Passages.withPassages(docs, w = 4)
      .select($"doc_id", $"passage_pos", $"passage")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 0, "a b c d"), (1L, 1, "e f g h"),
      (2L, 0, "a b c d"), (2L, 1, "x y z w")))
  }

  test("withOccurrenceCounts: corpus-wide counts attach to every instance") {
    val out = Passages.withOccurrenceCounts(docs, w = 4)
      .select($"doc_id", $"passage", $"n_occurrences")
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set(
      (1L, "a b c d", 2L), (1L, "e f g h", 1L),
      (2L, "a b c d", 2L), (2L, "x y z w", 1L)))
  }

  test("boilerplateTopK: deterministic (count desc, passage asc) top-k above minCount") {
    val more = docs.union(Seq((4L, "x y z w p q r s")).toDF("doc_id", "text"))
    val out = Passages.boilerplateTopK(more, w = 4, k = 5)
      .as[(String, Long, Long)].collect().toSeq
    // both repeated passages occur twice; tie broken by passage text asc
    assert(out == Seq(("a b c d", 2L, 2L), ("x y z w", 2L, 2L)))
  }
}
