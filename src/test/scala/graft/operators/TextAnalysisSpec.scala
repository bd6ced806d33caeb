package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and subword counts") {
    val df = Seq("the cat sat", "extraordinary").toDF("text")
    assert(df.select(TextAnalysis.nTokens($"text")).as[Int].collect().toSeq == Seq(3, 1))
    // ceil(len/4): the=1 cat=1 sat=1 -> 3; extraordinary(13)=4
    assert(df.select(TextAnalysis.nSubwords($"text")).as[Long].collect().toSeq == Seq(3L, 4L))
  }

  test("nRegexTokens splits like a BPE pre-tokenizer: letter runs, single digits, punct") {
    val df = Seq("don't stop", "abc12, x!").toDF("text")
    // don | ' | t | stop = 4 ; abc | 1 | 2 | , | x | ! = 6
    assert(df.select(TextAnalysis.nRegexTokens($"text")).as[Long].collect().toSeq == Seq(4L, 6L))
  }

  test("ngramRepetition: top/dup bigram fractions, short docs get zero counts and NULL fracs") {
    val df = Seq(
      (1L, "a b a b a b"),   // bigrams: ab,ba,ab,ba,ab -> 5 total, top 'a b'=3, all 5 duplicated
      (2L, "x y z w"),       // 3 distinct bigrams, none repeated
      (3L, "solo")           // < 2 tokens: no bigrams at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetition(df, n = 2)
      .select($"doc_id", $"n_ngrams", $"top_ngram_count", $"dup_ngram_count",
        $"top_ngram_frac", $"dup_ngram_frac")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, 5L, 3L, 5L, Some(0.6), Some(1.0))))
    assert(out(1) == ((2L, 3L, 1L, 0L, Some(1.0 / 3), Some(0.0))))
    assert(out(2) == ((3L, 0L, 0L, 0L, None, None))) // no phantom grams from sequence(1,0)
  }

  test("stopword and type-token ratios") {
    val df = Seq("the the cat").toDF("text")
    val Seq((sw, ttr)) = df.select(
      TextAnalysis.stopwordRatio($"text"),
      TextAnalysis.typeTokenRatio($"text")).as[(Double, Double)].collect().toSeq
    assert(math.abs(sw - 2.0 / 3) < 1e-12)
    assert(math.abs(ttr - 2.0 / 3) < 1e-12)
  }

  test("qualityScore rewards mid-length diverse prose, penalizes degenerate text") {
    val good = ("the quick brown fox jumps over a lazy dog and then runs to " +
      "the old stone bridge where it rests in warm sun for an hour of calm").trim
    val bad = Seq.fill(30)("aa").mkString(" ") // no stopwords, tiny diversity
    val df = Seq(good, bad).toDF("text")
    val Seq(qGood, qBad) = df.select(TextAnalysis.qualityScore($"text"))
      .as[Double].collect().toSeq
    assert(qGood == 1.0)
    assert(qBad <= 0.25)
  }

  test("predictedLang identifies marker-bearing text per language and 'und' without markers") {
    val samples = Seq(
      "the cat and the dog of the house is big" -> "en",
      "der hund und die katze ist gross" -> "de",
      "le chien et la maison est grande" -> "fr",
      "el perro y la casa es grande" -> "es",
      "qwerty zxcvb asdfgh" -> "und")
    val df = samples.map(_._1).toDF("text")
    val got = df.select(TextAnalysis.predictedLang($"text")).as[String].collect().toSeq
    assert(got == samples.map(_._2))
  }

  test("langIdJoin (relational form) agrees with predictedLang (expression form)") {
    val rng = new scala.util.Random(23)
    val vocab = Seq("the", "der", "le", "el", "cat", "hund", "chien", "gato",
      "and", "und", "et", "y", "is", "ist", "est", "es", "xyz", "qqq")
    val docs = (1L to 60L).map { i =>
      i -> Seq.fill(4 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }.toDF("doc_id", "text")
    val viaExpr = docs.select($"doc_id", TextAnalysis.predictedLang($"text").as("p"))
      .as[(Long, String)].collect().toMap
    val viaJoin = TextAnalysis.langIdJoin(docs).select($"doc_id", $"predicted")
      .as[(Long, String)].collect().toMap
    assert(viaJoin == viaExpr)
  }

  test("fingerprint is whitespace/case-normalized md5") {
    val df = Seq("Hello   World", "hello world").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1) && fps(0).length == 32)
  }

  test("every text function works on a column NOT named 'text' (no hardcoded column names)") {
    // the frame deliberately has no 'text' column at all — any leftover
    // expr("...text...") would fail analysis or compute garbage
    val df = Seq("the cat and the cat sat on it").toDF("body")
    val Seq((nt, nsw, sw, ttr, q, sEn)) = df.select(
      TextAnalysis.nTokens($"body"),
      TextAnalysis.nSubwords($"body"),
      TextAnalysis.stopwordRatio($"body"),
      TextAnalysis.typeTokenRatio($"body"),
      TextAnalysis.qualityScore($"body"),
      TextAnalysis.langScore($"body", "en")
    ).as[(Int, Long, Double, Double, Double, Int)].collect().toSeq
    assert(nt == 8)
    assert(nsw == 8)               // all words <= 4 chars -> 1 subword each
    assert(math.abs(sw - 4.0 / 8) < 1e-12)   // the, and, the, it
    assert(math.abs(ttr - 6.0 / 8) < 1e-12)  // the, cat, and, sat, on, it
    assert(q >= 0.0 && q <= 1.0)
    assert(sEn == 3)               // the, and, the
  }

  test("normalized collapses exactly the oracle's whitespace class; \\x0B passes through") {
    val df = Seq("a \t\n\f\r b", "ab", "a  b").toDF("body")
    val out = df.select(TextDedup.normalized($"body")).as[String].collect().toSeq
    assert(out(0) == "a b")
    // RE2 \s excludes vertical tab — the explicit class must too, or
    // engine and oracle hash \x0B documents differently
    assert(out(1) == "ab")
    assert(out(2) == "a b")
  }
}
