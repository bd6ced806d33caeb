package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def spans(d: DataFrame, n: Int = 3, minDocs: Int = 2): Set[(Long, Int, Int)] =
    SpanDedup.duplicatedSpans(d, n, minDocs)
      .select($"doc_id", $"span_start".cast("int"), $"span_end".cast("int"))
      .as[(Long, Int, Int)].collect().toSet

  test("over-budget Bloom-prescreen branch is bit-identical to the broadcast branch") {
    // force the bloom branch on a fixture corpus and compare every
    // output of the family against the default (broadcast) branch —
    // the prescreen may only pass extra candidates the exact semi
    // join then rejects, so results must be identical
    val d = docs(
      1L -> "a b c d e f g h i j",
      2L -> "c d e f g h i x y z",
      3L -> "q r s t u v w a b c",
      4L -> "q r s t u v w m n o")
    def family() = (
      SpanDedup.duplicatedSpans(d, n = 3).orderBy($"doc_id", $"span_start")
        .collect().toSeq,
      SpanDedup.excised(d, n = 3).orderBy($"doc_id").collect().toSeq,
      SpanDedup.spanProfile(d, n = 3).orderBy($"doc_id").collect().toSeq)
    val viaBroadcast = family()
    val prev = SpanDedup.dupKeysBudget
    SpanDedup.dupKeysBudget = 0L // every corpus is now "over budget"
    try {
      val viaBloom = family()
      assert(viaBloom == viaBroadcast)
    } finally SpanDedup.dupKeysBudget = prev
  }

  test("a shared run is reported with exact 1-based [start, end) token boundaries") {
    // tokens 3..7 of doc 1 ("c d e f g") appear as tokens 1..5 of doc 2
    val d = docs(
      1L -> "a b c d e f g",
      2L -> "c d e f g x y")
    // n=3 windows inside the shared 5-token run: all flagged, merged
    assert(spans(d, n = 3) == Set((1L, 3, 8), (2L, 1, 6)))
  }

  test("disjoint duplicated runs in one doc stay separate spans; adjacent windows merge") {
    val d = docs(
      1L -> "p q r GAP1 GAP2 s t u",
      2L -> "p q r OTHER s t u")
    // two 3-token runs shared; the gap tokens differ so the spans
    // must NOT merge across them
    assert(spans(d, n = 3) == Set(
      (1L, 1, 4), (1L, 6, 9),
      (2L, 1, 4), (2L, 5, 8)))
  }

  test("overlapping windows of a long shared run merge into ONE maximal span") {
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> s"$shared tail1", 2L -> s"head2 $shared")
    val s = spans(d, n = 4)
    // doc 1: tokens 1..10 shared; doc 2: tokens 2..11
    assert(s == Set((1L, 1, 11), (2L, 2, 12)))
  }

  test("within-doc repetition alone is not cross-doc duplication") {
    val d = docs(
      1L -> "x y z x y z x y z",
      2L -> "totally different words here")
    assert(spans(d, n = 3).isEmpty)
  }

  test("docs shorter than n contribute no windows and cannot be flagged") {
    val d = docs(1L -> "a b", 2L -> "a b", 3L -> "a b c", 4L -> "a b c")
    assert(spans(d, n = 3) == Set((3L, 1, 4), (4L, 1, 4)))
  }

  test("minDocs raises the bar: a pair-shared span disappears at minDocs=3") {
    val d = docs(
      1L -> "c o m m o n r u n",
      2L -> "c o m m o n r u n",
      3L -> "c o m m o n r u n",
      4L -> "o n l y p a i r A",
      5L -> "o n l y p a i r A")
    val s2 = spans(d, n = 9, minDocs = 2)
    val s3 = spans(d, n = 9, minDocs = 3)
    assert(s2 == Set((1L, 1, 10), (2L, 1, 10), (3L, 1, 10), (4L, 1, 10), (5L, 1, 10)))
    assert(s3 == Set((1L, 1, 10), (2L, 1, 10), (3L, 1, 10)))
  }

  test("profile accounts every span token exactly once against the doc's token count") {
    val d = docs(
      1L -> "p q r GAP1 GAP2 s t u",
      2L -> "p q r OTHER s t u",
      3L -> "unrelated text entirely here")
    val prof = SpanDedup.spanProfile(d, n = 3, minDocs = 2)
      .select($"doc_id", $"n_spans", $"dup_tokens", $"n_tokens", $"kept_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(prof.keySet == Set(1L, 2L)) // doc 3 has no dup span → absent
    assert(prof(1L) == ((2L, 6L, 8L, 2L))) // spans [1,4)+[6,9) of 8 tokens
    assert(prof(2L) == ((2L, 6L, 7L, 1L))) // spans [1,4)+[5,8) of 7 tokens
  }

  test("gram positions are ordered, 1-based, and empty below n") {
    val gp = SpanDedup.gramPositions(docs(1L -> "a b c d", 2L -> "a"), n = 2)
      .select($"doc_id", $"pos").as[(Long, Int)].collect().toSet
    assert(gp == Set((1L, 1), (1L, 2), (1L, 3)))
  }

  test("native gram kernel agrees with the interpreted HOF form") {
    val d = TextDedup.withTokenHashes(docs(1L -> "a b c d e"))
    val viaKernel = d.select(
      graft.GraftFunctions.gramHashes($"token_hashes", 3).as("g"))
      .as[Seq[Long]].head()
    val viaHof = d.selectExpr(
      s"""transform(sequence(1, size(token_hashes) - 2),
         |  i -> aggregate(slice(token_hashes, i, 3), 0L,
         |       (acc, h) -> (acc * 131 + h) % ${TextDedup.P}L)) AS g""".stripMargin)
      .as[Seq[Long]].head()
    assert(viaKernel == viaHof)
    assert(viaKernel.length == 3)
  }

  test("excision removes exactly the span tokens and reassembles in order") {
    val d = docs(
      1L -> "a b c d e f g",
      2L -> "c d e f g x y",
      3L -> "untouched words only here")
    val out = SpanDedup.excised(d, n = 3, minDocs = 2)
      .select($"doc_id", $"clean_text", $"n_tokens", $"kept_tokens")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (("a b", 7L, 2L)))       // tokens 3..7 excised
    assert(out(2L) == (("x y", 7L, 2L)))       // tokens 1..5 excised
    assert(out(3L) == (("untouched words only here", 4L, 4L)))
  }

  test("a fully-duplicated doc excises to the empty string, not a missing row") {
    val d = docs(1L -> "x y z w", 2L -> "x y z w")
    val out = SpanDedup.excised(d, n = 4, minDocs = 2)
      .select($"doc_id", $"clean_text", $"kept_tokens")
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "", 0L), (2L, "", 0L)))
  }

  test("disjoint spans excise independently; the gap survives") {
    val d = docs(
      1L -> "p q r GAP1 GAP2 s t u",
      2L -> "p q r OTHER s t u")
    val out = SpanDedup.excised(d, n = 3, minDocs = 2)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "GAP1 GAP2")
    assert(out(2L) == "OTHER")
  }

  test("empty input yields empty spans and profile, not a crash") {
    val empty = docs()
    assert(SpanDedup.duplicatedSpans(empty, n = 3).count() == 0L)
    assert(SpanDedup.spanProfile(empty, n = 3).count() == 0L)
  }
}
