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

  test("withChunks: stride-overlapping starts plus a tail-aligned chunk cover every token") {
    // 8 tokens, w = 4, stride = 2: starts 0, 2, 4 (full) — (8-4)%2 = 0, no tail
    val d1 = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8")).toDF("doc_id", "text")
    val c1 = Passages.withChunks(d1, w = 4, stride = 2)
      .select($"chunk_start", $"chunk", $"chunk_tokens", $"is_tail")
      .as[(Int, String, Int, Int)].collect().toSeq.sortBy(_._1)
    assert(c1.map(_._1) == Seq(0, 2, 4))
    assert(c1.forall(c => c._3 == 4 && c._4 == 0))
    assert(c1.head._2 == "t1 t2 t3 t4")
    // 9 tokens: starts 0, 2, 4 plus tail start 5 ((9-4)%2 = 1)
    val d2 = Seq((2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val c2 = Passages.withChunks(d2, w = 4, stride = 2)
      .select($"chunk_start", $"is_tail").as[(Int, Int)].collect().toSeq.sortBy(_._1)
    assert(c2 == Seq((0, 0), (2, 0), (4, 0), (5, 1)))
  }

  test("withChunks: coverage property on random docs — every token in >= 1 chunk, overlap bounded") {
    val rnd = new scala.util.Random(7L)
    val docs = (1L to 40L).map { id =>
      (id, (1 to rnd.nextInt(20)).map(i => s"t$i").mkString(" "))
    }.filter(_._2.nonEmpty).toDF("doc_id", "text")
    for ((w, s) <- Seq((4, 2), (6, 3), (5, 5), (3, 1))) {
      val chunks = Passages.withChunks(docs, w, s)
        .select($"doc_id", $"chunk_start", $"chunk_tokens")
        .as[(Long, Int, Int)].collect().toSeq.groupBy(_._1)
      docs.as[(Long, String)].collect().foreach { case (id, text) =>
        val n = text.split(" ", -1).length
        val cs = chunks(id).map(c => (c._2, c._3)).sortBy(_._1)
        // every token position 0..n-1 covered by some [start, start+len)
        val covered = cs.flatMap { case (st, len) => st until (st + len) }.toSet
        assert(covered == (0 until n).toSet, s"doc $id w=$w s=$s: $cs")
        // no chunk exceeds w tokens; full windows start at stride marks or the tail
        assert(cs.forall(_._2 <= w))
      }
    }
  }

  test("withChunks: short docs yield one whole-text chunk; keep columns pass through") {
    val d = Seq((1L, "a b", "s1")).toDF("doc_id", "text", "source")
    val rows = Passages.withChunks(d, w = 4, stride = 2, keep = Seq("source"))
      .select($"doc_id", $"source", $"chunk", $"chunk_tokens").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(1) == "s1" && rows.head.getString(2) == "a b"
      && rows.head.getInt(3) == 2)
  }
}
