package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM surprisal: the portable log2 ladder's accuracy contract,
  * the add-one-smoothed probability model on a hand-checked corpus,
  * and the plan/aggregation posture. */
class LanguageModelSpec extends SparkSpec {

  import spark.implicits._

  test("surprisalBits is exact at powers of two and within 0.0861 bits everywhere") {
    val ps = (1 to 60).map(t => math.pow(2.0, -t)) ++
      Seq(1.0, 0.75, 0.3, 0.11, 1e-4, 7e-9, 3e-13, 1e-18)
    val got = ps.toDF("p")
      .select(col("p"), LanguageModel.surprisalBits(col("p")).as("s"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    ps.foreach { p =>
      val exact = -math.log(p) / math.log(2.0)
      val err = math.abs(got(p) - exact)
      val isPow2 = math.pow(2.0, math.round(exact).toDouble) == 1.0 / p
      if (isPow2) assert(err < 1e-9, s"p=$p: pow2 must be exact, got ${got(p)} vs $exact")
      else assert(err <= 0.0862, s"p=$p err=$err")
    }
  }

  test("surprisalBits is monotone decreasing in p") {
    val ps = (1 to 500).map(i => i / 500.0)
    val got = ps.toDF("p")
      .select(LanguageModel.surprisalBits(col("p")).as("s"))
      .collect().map(_.getDouble(0))
    got.sliding(2).foreach { w => assert(w(0) >= w(1) - 1e-12) }
  }

  test("surprisalScores matches a hand-computed add-one bigram model") {
    // corpus: "a b a b" and "a b c"; vocab {a,b,c}, V=3
    // unigrams: a=3, b=3, c=1
    // bigrams: (a,b)=3, (b,a)=1, (b,c)=1
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = LanguageModel.surprisalScores(docs, docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def s(p: Double): Double = { // replicate ladder+chord locally
      val j = (1 to 64).count(t => p <= math.pow(2.0, -t))
      math.floor((j + 2.0 - p * math.pow(2.0, j + 1)) * 1e6 + 0.5)
    }
    // doc 1: bigrams (a,b),(b,a),(a,b): p(ab)=(3+1)/(3+3)=2/3, p(ba)=(1+1)/(3+3)=1/3
    val d1 = math.floor((s(2.0 / 3) + s(1.0 / 3) + s(2.0 / 3)) / 3.0 + 0.5) / 1e6
    // doc 2: (a,b),(b,c): p(ab)=2/3, p(bc)=(1+1)/(3+3)=1/3
    val d2 = math.floor((s(2.0 / 3) + s(1.0 / 3)) / 2.0 + 0.5) / 1e6
    assert(got(1L) == ((3L, d1)), s"doc1 got ${got(1L)} want ($d1)")
    assert(got(2L) == ((2L, d2)), s"doc2 got ${got(2L)} want ($d2)")
  }

  test("OOV continuations and contexts score against the smoothing floor") {
    val ref = Seq((1L, "a b a b")).toDF("doc_id", "text") // vocab {a,b}, V=2
    val docs = Seq((9L, "a z z q")).toDF("doc_id", "text")
    // bigrams: (a,z): c_ab=0, c_a(a)=2 -> p=1/(2+2)=0.25
    //          (z,z),(z,q): c_ab=0, c_a(z)=0 -> p=1/2
    val got = LanguageModel.surprisalScores(docs, ref).collect().head
    assert(got.getLong(1) == 3L)
    val exp = math.floor((math.floor(2.0 * 1e6 + 0.5) + 2 * math.floor(1.0 * 1e6 + 0.5)) / 3.0 + 0.5) / 1e6
    assert(got.getDouble(2) == exp, s"got ${got.getDouble(2)} want $exp")
  }

  test("backoffScores matches a hand-computed stupid-backoff model across all three branches") {
    // ref: "a b c a b c"  →  unigrams a=2,b=2,c=2 (N=6, V=3)
    //   bigrams: (a,b)=2, (b,c)=2, (c,a)=1
    //   trigrams: (a,b,c)=2, (b,c,a)=1, (c,a,b)=1
    val ref = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    // doc 9: "a b c a z" → trigrams:
    //   (a,b,c): in model → 2/2 = 1                      [branch 1]
    //   (b,c,a): in model → 1/2                          [branch 1]
    //   (c,a,z): no trigram, no (a,z) bigram, z OOV →
    //            0.4·0.4·(0+1)/(6+3)                     [branch 3]
    val docs = Seq((9L, "a b c a z")).toDF("doc_id", "text")
    val got = LanguageModel.backoffScores(docs, ref).collect().head
    def s(p: Double): Double = {
      val j = (1 to 64).count(t => p <= math.pow(2.0, -t))
      math.floor((j + 2.0 - p * math.pow(2.0, j + 1)) * 1e6 + 0.5)
    }
    val exp = math.floor((s(1.0) + s(0.5) + s(0.4 * 0.4 * (1.0 / 9))) / 3.0 + 0.5) / 1e6
    assert(got.getLong(1) == 3L)
    assert(got.getDouble(2) == exp, s"got ${got.getDouble(2)} want $exp")
    // branch 2: "x b c" — the (x,b,c) trigram is unseen (x is OOV)
    // but the backoff bigram (b,c) IS in the model → 0.4·(2/2)
    val d2 = Seq((7L, "x b c")).toDF("doc_id", "text")
    val got2 = LanguageModel.backoffScores(d2, ref).collect().head
    val exp2 = math.floor(s(0.4 * (2.0 / 2)) / 1.0 + 0.5) / 1e6
    assert(got2.getDouble(2) == exp2, s"got ${got2.getDouble(2)} want $exp2")
  }

  test("backoffScores: in-model text scores lower surprisal than held-out noise") {
    val ref = (1L to 40L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq((100L, "the quick brown fox jumps"), (101L, "dog the over fox quick"))
      .toDF("doc_id", "text")
    val got = LanguageModel.backoffScores(docs, ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(100L) < got(101L),
      s"in-model ${got(100L)} must beat shuffled ${got(101L)}")
  }

  test("documents with fewer than 2 tokens are absent; determinism holds") {
    val docs = Seq((1L, "only"), (2L, "a b")).toDF("doc_id", "text")
    def run() = LanguageModel.surprisalScores(docs, docs)
      .collect().map(_.getLong(0)).toSet
    assert(run() == Set(2L))
    assert(run() == run())
  }

  test("plan: per-doc reduce is a partial-aggregable HashAggregate; no ObjectHashAggregate") {
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val p = LanguageModel.surprisalScores(docs, docs)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(3000))
    assert(!p.contains("ObjectHashAggregate"), p.take(3000))
  }
}
