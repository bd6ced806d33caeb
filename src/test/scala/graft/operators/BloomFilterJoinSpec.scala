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
    intercept[IllegalArgumentException](BloomFilterJoin.build(df, $"k", mBits = 1 << 28))
    intercept[IllegalArgumentException](BloomFilterJoin.build(df, $"k", nHash = 0))
    intercept[IllegalArgumentException](BloomFilterJoin.build(df, $"k", nHash = 17))
  }

  test("mixed-type keys (int fact, long dim) lose no rows — hashes go through the coerced type") {
    // xxhash64 is type-sensitive: before the coercion fix this shape
    // silently dropped EVERY matching row (bit positions diverge while
    // the join's implicit cast still matches)
    val fact = (1 to 500).map(i => (i % 100, i)).toDF("k", "v") // int keys
    val dim = (0 until 100 by 3).map(k => (k.toLong, s"d$k")).toDF("dk", "name") // long keys
    val plain = fact.join(dim, $"k" === $"dk")
      .select($"k", $"v", $"name").as[(Int, Int, String)].collect().sorted.toSeq
    assert(plain.nonEmpty)
    val reduced = BloomFilterJoin.reducedJoin(fact, "k", dim, "dk")
      .select($"k", $"v", $"name").as[(Int, Int, String)].collect().sorted.toSeq
    assert(reduced == plain)
    // incompatible families fail fast instead of silently dropping rows
    val sdim = Seq(("1", "x")).toDF("dk", "name")
    intercept[IllegalArgumentException](BloomFilterJoin.reducedJoin(fact, "k", sdim, "dk"))
  }

  test("NULL keys explicitly fail mightContain (safe as a standalone anti-join prefilter)") {
    val keys = (1 to 50).map(i => s"key$i").toDF("s")
    val bloom = BloomFilterJoin.build(keys, $"s", mBits = 1 << 12, nHash = 4)
    val probe = Seq(Some("key1"), None).toDF("s")
    val passed = probe.where(bloom.mightContain($"s")).as[String].collect().toSeq
    assert(passed == Seq("key1")) // the NULL row must NOT pass
  }

  test("auto-sizing: formula matches the standard bound and saturation stays healthy") {
    // m = ceil(-n ln p / ln^2 2), k = round(m/n ln 2)
    val (m, k) = BloomFilterJoin.sizeFor(1000, 0.01)
    assert(m == math.ceil(1000 * math.log(100.0) / math.pow(math.log(2), 2)).toInt, s"m=$m")
    assert(k == math.round(m / 1000.0 * math.log(2)).toInt, s"k=$k")
    // clamps: tiny builds get the 1024-bit floor; huge ones the 2^27 cap
    assert(BloomFilterJoin.sizeFor(1, 0.01)._1 == 1024)
    assert(BloomFilterJoin.sizeFor(100000000L, 0.01)._1 == (1 << 27))
    // auto-built filter on a dim-sized build side: saturation < 0.5
    // (at the 1% design point it should sit near ln2/2 ≈ 0.35... bits
    // set ~ half of capacity → actually ~0.5^k fpp at 50%; the design
    // target keeps it below)
    val dim = (1 to 5000).map(i => s"d$i").toDF("s")
    val bloom = BloomFilterJoin.buildAuto(dim, $"s")
    assert(bloom.saturation < 0.5, s"saturation=${bloom.saturation}")
    assert(bloom.saturation > 0.0)
    val missed = dim.where(!bloom.mightContain($"s")).count()
    assert(missed == 0)
  }
}
