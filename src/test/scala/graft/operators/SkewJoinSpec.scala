package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces the identical row multiset to a plain join, hot key included") {
    // 90% of fact rows share one key (the classic skew shape)
    val rng = new scala.util.Random(5)
    val fact = (1 to 2000).map { i =>
      val k = if (rng.nextDouble() < 0.9) 1 else 1 + rng.nextInt(50)
      (k, i)
    }.toDF("k", "v")
    val dim = (1 to 50).map(k => (k, s"name$k")).toDF("k", "name")
    val plain = fact.join(dim, "k").select($"k", $"v", $"name")
      .as[(Int, Int, String)].collect().sorted.toSeq
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), factor = 8)
      .select($"k", $"v", $"name").as[(Int, Int, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin preserves duplicate matches on the small side") {
    val fact = Seq((1, "a"), (1, "b")).toDF("k", "v")
    val dim = Seq((1, "x"), (1, "y")).toDF("k", "w") // 2 dim rows same key
    val out = SkewJoin.saltedJoin(fact, dim, Seq("k"), factor = 4).count()
    assert(out == 4) // 2 fact × 2 dim
  }

  test("saltedJoin tolerates map-typed columns on the large side") {
    val fact = Seq((1, Map("a" -> 1)), (2, Map("b" -> 2))).toDF("k", "props")
    val dim = Seq((1, "x"), (2, "y")).toDF("k", "name")
    assert(SkewJoin.saltedJoin(fact, dim, Seq("k"), factor = 4).count() == 2)
  }

  test("saltedCount equals plain count per key") {
    val df = (1 to 500).map(i => if (i % 5 == 0) "hot" else s"k$i").toDF("k")
    val plain = df.groupBy($"k").count().as[(String, Long)].collect().toMap
    val salted = SkewJoin.saltedCount(df, "k", factor = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("heavyHitters surfaces the dominant key first") {
    val df = (Seq.fill(100)("hot") ++ (1 to 20).map(i => s"k$i")).toDF("k")
    val top = SkewJoin.heavyHitters(df, "k", k = 3).as[(String, Long)].collect()
    assert(top.head == (("hot", 100L)))
  }

  test("joinSkewSafe: both branches produce the identical row multiset to a plain join") {
    val dim = (1 to 50).map(k => (k, s"name$k")).toDF("k", "name")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"v", $"name").as[(Int, Int, String)].collect().sorted.toSeq
    // skewed shape → salted branch
    val hot = (1 to 2000).map(i => (if (i % 10 != 0) 1 else 1 + i % 50, i)).toDF("k", "v")
    assert(multiset(SkewJoin.joinSkewSafe(hot, dim, Seq("k"), sampleFraction = 1.0))
      == multiset(hot.join(dim, "k")))
    // uniform shape → plain branch
    val flat = (1 to 2000).map(i => (1 + i % 50, i)).toDF("k", "v")
    assert(multiset(SkewJoin.joinSkewSafe(flat, dim, Seq("k"), sampleFraction = 1.0))
      == multiset(flat.join(dim, "k")))
  }

  test("joinSkewSafe: plain branch stays a broadcast hash join; salted branch actually salts") {
    val dim = (1 to 50).map(k => (k, s"name$k")).toDF("k", "name")
    val flat = (1 to 2000).map(i => (1 + i % 50, i)).toDF("k", "v")
    val pPlain = SkewJoin.joinSkewSafe(flat, dim, Seq("k"), sampleFraction = 1.0)
      .queryExecution.executedPlan.toString
    assert(pPlain.contains("BroadcastHashJoin"), pPlain)
    assert(!pPlain.contains("_salt"), pPlain)
    val hot = (1 to 2000).map(i => (if (i % 10 != 0) 1 else 1 + i % 50, i)).toDF("k", "v")
    val pHot = SkewJoin.joinSkewSafe(hot, dim, Seq("k"), sampleFraction = 1.0)
      .queryExecution.executedPlan.toString
    assert(pHot.contains("_salt"), pHot)
  }

  test("joinSkewSafe: empty large side dispatches plain and returns empty") {
    val dim = (1 to 5).map(k => (k, s"n$k")).toDF("k", "name")
    val empty = Seq.empty[(Int, Int)].toDF("k", "v")
    assert(SkewJoin.joinSkewSafe(empty, dim, Seq("k"), sampleFraction = 1.0).count() == 0)
  }

  test("detectSkew: the dispatch decision itself flips at the hotShare boundary, deterministically") {
    // 90% of rows on one key → hottest share 0.9: SALTED at the default
    // 0.2 threshold
    val hot = (1 to 2000).map(i => (if (i % 10 != 0) 1 else 1 + i % 50, i)).toDF("k", "v")
    assert(SkewJoin.detectSkew(hot, Seq("k"), sampleFraction = 1.0))
    // uniform over 50 keys → hottest share 0.02: plain
    val flat = (1 to 2000).map(i => (1 + i % 50, i)).toDF("k", "v")
    assert(!SkewJoin.detectSkew(flat, Seq("k"), sampleFraction = 1.0))
    // boundary pin (full sample = exact shares): one key holding
    // EXACTLY hotShare of the rows triggers salting (>= comparison);
    // epsilon below it does not
    val half = ((1 to 500).map(i => (1, i)) ++ (1 to 500).map(i => (1 + i % 50, i)))
      .toDF("k", "v") // key 1 holds 500 + 10 of 1000 rows = 0.51
    assert(SkewJoin.detectSkew(half, Seq("k"), sampleFraction = 1.0, hotShare = 0.51))
    assert(!SkewJoin.detectSkew(half, Seq("k"), sampleFraction = 1.0, hotShare = 0.52))
    // sampled decision is seeded: same input, same answer, every call
    val sampled = (1 to 3)
      .map(_ => SkewJoin.detectSkew(hot, Seq("k"), sampleFraction = 0.1))
    assert(sampled.distinct.size == 1)
    // empty input: no evidence of skew, never salts
    assert(!SkewJoin.detectSkew(Seq.empty[(Int, Int)].toDF("k", "v"), Seq("k"),
      sampleFraction = 1.0))
  }
}
