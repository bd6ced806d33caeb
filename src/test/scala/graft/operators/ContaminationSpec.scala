package graft.operators

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // 8-token benchmark passage; doc 10 embeds it verbatim, doc 11
  // shares only 7 of its tokens in a row, doc 12 is clean.
  private val passage = "alpha beta gamma delta epsilon zeta eta theta"
  private val bench = Seq(
    (100L, s"intro $passage outro"),
    (101L, "one two three four five six seven eight nine")
  ).toDF("doc_id", "text")
  private val corpus = Seq(
    (10L, s"prefix words here $passage trailing tail"),
    (11L, "alpha beta gamma delta epsilon zeta eta MISMATCH"),
    (12L, "totally unrelated content with other tokens entirely filling")
  ).toDF("doc_id", "text")

  test("overlapPairs flags exactly the verbatim 8-gram carrier") {
    val pairs = Contamination.overlapPairs(corpus, bench, n = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((10L, 100L, 1L)))
  }

  test("a shorter gram window widens detection (7-gram catches the partial copy)") {
    val pairs = Contamination.overlapPairs(corpus, bench, n = 7)
      .select($"corpus_doc").as[Long].collect().toSet
    assert(pairs == Set(10L, 11L))
  }

  test("minHits raises the collision bar") {
    // at n=3 doc 10 shares many shingles with bench 100; doc 11 fewer
    val loose = Contamination.overlapPairs(corpus, bench, n = 3, minHits = 1)
      .select($"corpus_doc").as[Long].collect().toSet
    val strict = Contamination.overlapPairs(corpus, bench, n = 3, minHits = 6)
      .select($"corpus_doc").as[Long].collect().toSet
    assert(loose.contains(11L) && !strict.contains(11L))
    assert(strict.contains(10L))
  }

  test("report rolls up per corpus doc") {
    val r = Contamination.report(corpus, bench, n = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((10L, 1L, 1L, 1L)))
  }

  test("decontaminate drops flagged docs and keeps the rest intact") {
    val kept = Contamination.decontaminate(corpus, bench, n = 8)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 12L))
  }

  test("an empty benchmark flags nothing") {
    assert(Contamination.overlapPairs(corpus, bench.limit(0), n = 8).count() == 0)
    assert(Contamination.decontaminate(corpus, bench.limit(0), n = 8).count() == 3)
  }
}
