package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE merge training: greedy semantics, the Sennrich worked example,
  * driver/distributed path equivalence, early stop, vocab rollup. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeGreedy resolves overlapping runs left-first") {
    assert(Bpe.mergeGreedy(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
    assert(Bpe.mergeGreedy(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergeGreedy(Vector("x", "a", "b", "y", "a", "b"), "a", "b") ==
      Vector("x", "ab", "y", "ab"))
    // merged symbol never re-matches within the round
    assert(Bpe.mergeGreedy(Vector("a", "b", "b"), "a", "b") == Vector("ab", "b"))
  }

  // The worked example from Sennrich et al. 2016 §3.2 (word freqs for
  // low/lower/newest/widest): first merges are (e,s), (es,t), (est,</w>).
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainLocal reproduces the Sennrich worked example") {
    val (merges, seqs) = Bpe.trainLocal(sennrich, rounds = 4)
    assert(merges.map(m => (m.left, m.right)).take(3) ==
      Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    assert(merges.head.pairCount == 9L) // 6 (newest) + 3 (widest)
    val byWord = seqs.map(s => s._1 -> s._3).toMap
    assert(byWord("newest").contains("est</w>"))
  }

  test("driver and distributed paths produce identical merges and sequences") {
    val dict = sennrich.toDF("word", "cnt")
    val (mLocal, sLocal) = Bpe.train(dict, rounds = 5)
    val (mDist, sDist) = Bpe.train(dict, rounds = 5, driverWordLimit = 0)
    assert(mLocal == mDist)
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"word", $"cnt", concat_ws("", $"seq").as("s"))
        .orderBy($"word").collect().toSeq
    assert(norm(sLocal) == norm(sDist))
  }

  test("argmax tiebreak is count desc then lexicographic (left, right)") {
    // every pair ties at 2; the lexicographic (left, right) min is
    // (a, </w>) — '<' (0x3C) sorts before any letter in both engines
    val (merges, _) = Bpe.trainLocal(Seq(("ab", 2L), ("ba", 2L)), rounds = 1)
    assert(merges.head.left == "a" && merges.head.right == "</w>")
    // and with no marker pair in the tie, (a,b) < (a,c) < (b,*)
    val (m2, _) = Bpe.trainLocal(Seq(("ab", 2L), ("ac", 2L)), rounds = 1)
    assert((m2.head.left, m2.head.right) == ("a", "b"))
  }

  test("tiebreak is UTF-8 binary even for non-BMP symbols (path equivalence)") {
    // U+1F642 (🙂) encodes as a UTF-16 surrogate pair starting 0xD83D,
    // which sorts BELOW U+E000 in code-unit order — but its UTF-8 lead
    // byte 0xF0 sorts ABOVE U+E000's 0xEE. Spark StringType and DuckDB
    // both compare UTF-8 bytes, so tied pairs must pick U+E000 first;
    // Scala's default String ordering would pick the emoji.
    val dict = Seq(("🙂", 2L), ("", 2L))
    val (mLocal, _) = Bpe.trainLocal(dict, rounds = 1)
    assert(mLocal.head.left == "" && mLocal.head.right == "</w>")
    // and the driver path agrees with the relational path bit-for-bit
    val df = dict.toDF("word", "cnt")
    val (mDist, _) = Bpe.train(df, rounds = 2, driverWordLimit = 0)
    val (mDrv, _) = Bpe.train(df, rounds = 2)
    assert(mDrv == mDist)
    assert(mDrv.head.left == "")
  }

  test("training stops early when a word fully collapses and no pairs remain") {
    val (merges, seqs) = Bpe.trainLocal(Seq(("ab", 10L)), rounds = 6)
    // r1: (a,b) -> ab ; r2: (ab,</w>) -> ab</w> ; r3: single symbol, stop
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("ab", "</w>")))
    assert(seqs.head._3 == Seq("ab</w>"))
  }

  test("distributed path also stops early on an exhausted dict") {
    val dict = Seq(("ab", 10L)).toDF("word", "cnt")
    val (merges, seqs) = Bpe.train(dict, rounds = 6, driverWordLimit = 0)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b"), ("ab", "</w>")))
    assert(seqs.select($"seq").as[Seq[String]].collect().head == Seq("ab</w>"))
  }

  test("paths agree on a run-heavy random dict (overlap resolution stress)") {
    // small alphabet + doubled letters force same-symbol runs — the
    // case where greedy-left-first and a naive "merge every hit"
    // diverge; seeded so the fixture is reproducible
    val rnd = new scala.util.Random(20260814L)
    val words = (1 to 60).map { _ =>
      (1 to (2 + rnd.nextInt(6))).map { _ =>
        val c = ('a' + rnd.nextInt(3)).toChar
        if (rnd.nextBoolean()) s"$c$c" else s"$c"
      }.mkString
    }.distinct
    val dict = words.map(w => (w, 1L + rnd.nextInt(9))).toDF("word", "cnt")
    val (mLocal, sLocal) = Bpe.train(dict, rounds = 6)
    val (mDist, sDist) = Bpe.train(dict, rounds = 6, driverWordLimit = 0)
    assert(mLocal == mDist)
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"word", concat_ws("", $"seq").as("s"))
        .orderBy($"word").collect().toSeq
    assert(norm(sLocal) == norm(sDist))
  }

  test("segment replays training sequences on seen words and generalizes to unseen") {
    val (merges, seqs) = Bpe.trainLocal(sennrich, rounds = 4)
    // on every trained word, inference == the training-side sequence
    seqs.foreach { case (w, _, s) => assert(Bpe.segment(w, merges) == s, w) }
    // unseen word built from trained subwords: "lowest" picks up est</w>
    val unseen = Bpe.segment("lowest", merges)
    assert(unseen.last == "est</w>", unseen)
    // fully novel characters fall back to character pieces
    assert(Bpe.segment("zz", merges) == Seq("z", "z", "</w>"))
  }

  test("empty dict trains zero merges") {
    val dict = spark.emptyDataset[(String, Long)].toDF("word", "cnt")
    val (merges, seqs) = Bpe.train(dict, rounds = 3)
    assert(merges.isEmpty && seqs.isEmpty)
  }

  test("wordDict splits on whitespace, drops empties and NULL text, weights by occurrences") {
    val docs = Seq((1L, "a b  a"), (2L, null.asInstanceOf[String]), (3L, "b"))
      .toDF("doc_id", "text")
    val d = Bpe.wordDict(docs).orderBy($"word").as[(String, Long)].collect().toSeq
    assert(d == Seq(("a", 2L), ("b", 2L)))
  }

  test("vocab rolls up distinct words, slots and weighted counts per symbol") {
    val (_, seqs) = Bpe.train(sennrich.toDF("word", "cnt"), rounds = 3)
    val v = Bpe.vocab(seqs)
      .select($"sym", $"n_words", $"n_slots", $"weighted_count")
      .as[(String, Long, Long, Long)].collect().toSeq
    // after (e,s),(es,t),(est,</w>): "est</w>" present in newest+widest
    val est = v.find(_._1 == "est</w>").get
    assert(est._2 == 2L && est._3 == 2L && est._4 == 9L)
    // w appears in low, lower, newest — 3 distinct words, 4 slots
    // (newest has none; low/lower/... recount: low=l,o,w ; lower=l,o,w,e,r ;
    // newest=n,e,w,e,s,t ; widest=w,i,d,e,s,t — 'w' words: low, lower,
    // newest, widest = 4 words; slots 4; weighted 5+2+6+3 = 16
    val w = v.find(_._1 == "w").get
    assert(w._2 == 4L && w._3 == 4L && w._4 == 16L)
  }
}
