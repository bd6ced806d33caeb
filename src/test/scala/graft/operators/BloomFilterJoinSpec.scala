package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFilterJoinSpec extends SparkSpec {
  import spark.implicits._

  test("reducedJoin produces the identical row multiset to the plain join") {
    val rng = new scala.util.Random(11)
    val fact = (1 to 3000).map(i => (rng.nextInt(400), i)).toDF("k", "v")
    val dim = (0 until 400 by 7).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, $"k" === $"dk")
      .select($"k", $"v", $"name").as[(Int, Int, String)].collect().sorted.toSeq
    val reduced = BloomFilterJoin.reducedJoin(fact, "k", dim, "dk")
      .select($"k", $"v", $"name").as[(Int, Int, String)].collect().sorted.toSeq
    assert(reduced == plain)
  }

  test("no false negatives: every build key passes mightContain, even in a tiny saturated bitset") {
    val keys = (1 to 500).map(i => s"key$i").toDF("s")
    // 512 bits for 500 keys: heavily saturated, FP-rich — FNs still impossible
    val bloom = BloomFilterJoin.build(keys, $"s", mBits = 512, nHash = 4)
    val missed = keys.where(!bloom.mightContain($"s")).count()
    assert(missed == 0)
    assert(bloom.saturation > 0.5) // genuinely saturated, so the test means something
  }

  test("selective build side actually prunes the probe side before the join") {
    val fact = (1 to 5000).map(i => (i % 1000, i)).toDF("k", "v")
    val dim = (0 until 50).map(k => (k, s"d$k")).toDF("dk", "name") // 5% of key space
    val bloom = BloomFilterJoin.build(dim, $"dk", mBits = 1 << 14, nHash = 4)
    val kept = fact.where(bloom.mightContain($"k")).count()
    // 5% true matches + a small FP tail; anything under 15% proves real pruning
    assert(kept >= 250 && kept <= 750, s"kept $kept of 5000")
  }

  test("empty build side filters everything and the join stays empty (not an error)") {
    val fact = (1 to 100).map(i => (i, i)).toDF("k", "v")
    val dim = Seq.empty[(Int, String)].toDF("dk", "name")
    assert(BloomFilterJoin.reducedJoin(fact, "k", dim, "dk").count() == 0)
    val bloom = BloomFilterJoin.build(dim, $"dk", mBits = 1024, nHash = 4)
    assert(bloom.saturation == 0.0)
  }

  test("NULL keys on either side never join and never corrupt the bitset") {
    val fact = Seq((Some(1), "a"), (None, "b"), (Some(2), "c")).toDF("k", "v")
    val dim = Seq((Some(1), "x"), (None, "y")).toDF("dk", "name")
    val out = BloomFilterJoin.reducedJoin(fact, "k", dim, "dk")
      .select($"k", $"v", $"name").as[(Int, String, String)].collect().toSeq
    assert(out == Seq((1, "a", "x")))
  }

  test("probe predicate is builtin-only codegen — no UDF in the plan") {
    val fact = (1 to 100).map(i => (i, i)).toDF("k", "v")
    val dim = (1 to 10).map(k => (k, s"d$k")).toDF("dk", "name")
    val p = BloomFilterJoin.reducedJoin(fact, "k", dim, "dk")
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))
  }

  test("build is a bounded parameter fetch: word array sized by mBits, not input rows") {
    val keys = (1 to 10000).map(i => s"k$i").toDF("s")
    val bloom = BloomFilterJoin.build(keys, $"s", mBits = 256, nHash = 3)
    assert(bloom.words.size == 4) // 256 bits = 4 longs regardless of 10k inputs
  }

  test("parameter bounds are enforced") {
    val df = Seq(1).toDF("k")
    intercept[IllegalArgumentException](BloomFilterJoin.build(df, $"k", mBits = 0))
    intercept[IllegalArgumentException](BloomFilterJoin.build(df, $"k", nHash = 0))
    intercept[IllegalArgumentException](BloomFilterJoin.build(df, $"k", nHash = 17))
  }
}
