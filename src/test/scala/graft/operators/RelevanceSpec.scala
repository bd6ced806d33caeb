package graft.operators

import graft.SparkSpec

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, one rare term ("needle"), one ubiquitous term ("the")
  private val docs = Seq(
    (1L, "needle in the stack the stack"),
    (2L, "the stack the stack the stack"),
    (3L, "needle needle in the stack here"),
    (4L, "plain filler text without matches")
  ).toDF("doc_id", "text")

  test("termFreqs counts per (doc, term) with doc length, query terms only") {
    val tf = Relevance.termFreqs(docs, Seq("needle", "the"))
      .as[(Long, Int, String, Long)].collect()
      .map { case (d, dl, t, f) => (d, t) -> ((dl, f)) }.toMap
    assert(tf((1L, "needle")) == ((6, 1L)))
    assert(tf((1L, "the")) == ((6, 2L)))
    assert(tf((3L, "needle")) == ((6, 2L)))
    assert(!tf.contains((4L, "needle")) && !tf.contains((4L, "the")))
    assert(!tf.exists(_._1._2 == "stack"), "non-query terms must not survive")
  }

  test("rare terms dominate: the doc with two needles outranks pure-stopword docs") {
    val top = Relevance.bm25TopK(docs, Seq("needle", "the"), k = 4)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 3L, s"expected doc 3 first, got ${top.toSeq}")
    // doc 2 (3x "the", no needle) must rank below both needle docs
    val order = top.map(_._1).toSeq
    assert(order.indexOf(2L) > order.indexOf(1L))
    assert(!order.contains(4L), "doc with no query terms must not score")
  }

  test("bm25 matches the closed-form value on a hand-checked doc") {
    // doc 1, term "needle": tf=1, df=2, N=4, dl=6, avgdl=(6+6+6+5)/4
    val n = 4.0; val df = 2.0; val tf = 1.0; val dl = 6.0; val avgdl = 23.0 / 4.0
    val k1 = 1.2; val b = 0.75
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val needle = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    // term "the": tf=2, df=3
    val idf2 = math.log(1.0 + (n - 3.0 + 0.5) / (3.0 + 0.5))
    val the = idf2 * (2.0 * (k1 + 1.0)) / (2.0 + k1 * ((1.0 - b) + b * dl / avgdl))
    val expected = (math.floor(needle * 1e6 + 0.5) + math.floor(the * 1e6 + 0.5)) / 1e6
    val got = Relevance.bm25TopK(docs, Seq("needle", "the"), k = 4)
      .filter($"doc_id" === 1L).as[(Long, Double)].collect().head._2
    assert(got == expected, s"got $got expected $expected")
  }

  test("corpusStats: doc count and average length") {
    val (nd, avgdl) = Relevance.corpusStats(docs).as[(Long, Double)].collect().head
    assert(nd == 4L && avgdl == 23.0 / 4.0)
  }

  test("bm25TopK rejects empty query and non-positive k") {
    intercept[IllegalArgumentException](Relevance.bm25TopK(docs, Seq.empty, 5))
    intercept[IllegalArgumentException](Relevance.bm25TopK(docs, Seq("x"), 0))
  }
}
