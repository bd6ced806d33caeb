package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Scala replica of the portable char-fold hash, to pin the Spark
    * expression against an independent implementation. */
  private def charFoldRef(w: String): Long =
    w.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % TextDedup.P)

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  test("token hashes match an independent fold implementation") {
    val d = docs(1L -> "ab cd", 2L -> "x")
    val out = TextDedup.withTokenHashes(d)
      .select($"doc_id", $"token_hashes").as[(Long, Seq[Long])]
      .collect().toMap
    assert(out(1L) == Seq(charFoldRef("ab"), charFoldRef("cd")))
    assert(out(2L) == Seq(charFoldRef("x")))
  }

  test("shingles: docs shorter than n yield empty array, not sequence(1,0) garbage") {
    val d = docs(1L -> "one two", 2L -> "one two three four")
    val out = TextDedup.withShingleHashes(d, n = 3)
      .select($"doc_id", size($"shingle_hashes")).as[(Long, Int)].collect().toMap
    assert(out(1L) == 0)
    assert(out(2L) == 2) // 4 tokens -> 2 trigrams
  }

  test("exactDedupSummary counts normalized duplicates (case/whitespace-insensitive)") {
    val d = docs(1L -> "Hello  World", 2L -> "hello world", 3L -> "different")
    val Seq((n, u, dup)) = TextDedup.exactDedupSummary(d)
      .as[(Long, Long, Long)].collect().toSeq
    assert((n, u, dup) == ((3L, 2L, 1L)))
  }

  test("jaccardPairs matches hand-computed similarity") {
    // doc1/doc2 share 2 of their trigram shingles; doc3 disjoint
    val d = docs(
      1L -> "a b c d",   // shingles: abc, bcd
      2L -> "a b c e",   // shingles: abc, bce
      3L -> "x y z w")   // shingles: xyz, yzw
    val out = TextDedup.jaccardPairs(d, n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.3333))) // |∩|=1, |∪|=3
  }

  /** Brute-force reference: all pairs, exact Jaccard, no pruning. */
  private def bruteJaccard(d: DataFrame, n: Int, t: Double): Set[(Long, Long, Double)] = {
    val arrs = TextDedup.shingleArrays(d, n)
      .select($"doc_id", $"shingle_hashes").as[(Long, Seq[Long])].collect()
    (for {
      (ia, sa) <- arrs; (ib, sb) <- arrs if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      union = sa.toSet.union(sb.toSet).size
      j = math.floor(inter.toDouble / union * 1e4 + 0.5) / 1e4
      if union > 0 && j >= t
    } yield (ia, ib, j)).toSet
  }

  test("containment catches a quoted subset that Jaccard misses, directed sub -> sup") {
    // doc 2's text is doc 1's prefix: every one of its 3 shingles is
    // shared, but J = 3/10 misses a 0.5 cut; containment = 1.0
    val d = docs(
      1L -> "a b c d e f g h i j k l", // 10 trigram shingles
      2L -> "a b c d e",               // 3, all contained in doc 1
      3L -> "q r s t u")               // disjoint
    val cont = TextDedup.containmentPairs(d, n = 3, threshold = 0.8)
      .as[(Long, Long, Int, Double, Double)].collect().toSeq
    assert(cont == Seq((2L, 1L, 3, 1.0, 0.3)))
    val jac = TextDedup.jaccardPairsIndex(d, n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(jac.isEmpty) // the symmetric screen does NOT see the quote
  }

  test("containmentPairs == brute force over shingle sets (threshold sweep)") {
    val d = docs(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      2L -> "w1 w2 w3 w4 w5",
      3L -> "w4 w5 w6 w7 w8 w9",
      4L -> "z1 z2 z3 z4",
      5L -> "z1 z2 z3 z4") // identical to 4: containment 1.0, tie -> lower id sub
    val arrs = TextDedup.shingleArrays(d, 3)
      .select($"doc_id", $"shingle_hashes").as[(Long, Seq[Long])].collect()
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val brute = (for {
        (ia, sa) <- arrs; (ib, sb) <- arrs if ia < ib
        inter = sa.toSet.intersect(sb.toSet).size
        craw = inter.toDouble / math.min(sa.size, sb.size)
        if craw >= t
      } yield {
        val (sub, sup) = if (sa.size <= sb.size) (ia, ib) else (ib, ia)
        (sub, sup, math.floor(craw * 1e4 + 0.5) / 1e4)
      }).toSet
      val got = TextDedup.containmentPairs(d, n = 3, threshold = t)
        .select($"doc_sub", $"doc_sup", $"containment")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == brute, s"threshold $t")
      // the rarest-prefix branch must find the same pairs (loss-less)
      val viaPrefix = TextDedup.containmentPairsPrefix(d, n = 3, threshold = t)
        .select($"doc_sub", $"doc_sup", $"containment")
        .as[(Long, Long, Double)].collect().toSet
      assert(viaPrefix == brute, s"prefix branch, threshold $t")
    }
  }

  test("containment prefix filter is loss-less on a varied corpus; adaptive dispatch agrees") {
    val words = Seq("the", "cat", "sat", "on", "mat", "dog", "ran", "red")
    val rng = new scala.util.Random(33)
    val corpus = (1L to 35L).map { i =>
      i -> Seq.fill(6 + rng.nextInt(10))(words(rng.nextInt(words.size))).mkString(" ")
    }
    val d = docs(corpus: _*)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_sub", $"doc_sup", $"n_sub", $"containment", $"jaccard")
        .as[(Long, Long, Int, Double, Double)].collect().toSet
    for (t <- Seq(0.5, 0.8)) {
      val viaIndex = pairs(TextDedup.containmentPairs(d, n = 3, threshold = t))
      val viaPrefix = pairs(TextDedup.containmentPairsPrefix(d, n = 3, threshold = t))
      assert(viaPrefix == viaIndex, s"threshold $t")
      // forced budgets pin the dispatch to each branch
      assert(pairs(TextDedup.containmentPairsAdaptive(d, n = 3, threshold = t)) == viaIndex)
      assert(pairs(TextDedup.containmentPairsAdaptive(d, n = 3, threshold = t,
        fanoutBudget = 0L)) == viaIndex)
    }
  }

  test("prefix filtering is loss-less: jaccardPairs == brute force on a varied corpus") {
    val words = Seq("the", "cat", "sat", "on", "mat", "dog", "ran", "far", "big", "red")
    val rng = new scala.util.Random(7)
    val corpus = (1L to 40L).map { i =>
      val base = Seq.fill(8 + rng.nextInt(8))(words(rng.nextInt(words.size)))
      i -> base.mkString(" ")
    }
    val d = docs(corpus: _*)
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val expected = bruteJaccard(d, 3, t)
      val prefix = TextDedup.jaccardPairs(d, n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val index = TextDedup.jaccardPairsIndex(d, n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(prefix == expected, s"prefix strategy, threshold $t")
      assert(index == expected, s"index strategy, threshold $t")
    }
  }

  test("adaptive jaccard dispatch: both branches forced, both equal the brute-force set") {
    val words = Seq("the", "cat", "sat", "on", "mat", "dog", "ran")
    val rng = new scala.util.Random(21)
    val corpus = (1L to 30L).map { i =>
      i -> Seq.fill(8 + rng.nextInt(6))(words(rng.nextInt(words.size))).mkString(" ")
    }
    val d = docs(corpus: _*)
    val expected = bruteJaccard(d, 3, 0.5)
    // huge budget → index branch; zero budget → prefix branch
    val viaIndex = TextDedup.jaccardPairsAdaptive(d, n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val viaPrefix = TextDedup.jaccardPairsAdaptive(d, n = 3, threshold = 0.5, fanoutBudget = 0L)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIndex == expected)
    assert(viaPrefix == expected)
  }

  test("tier-3 dispatch: above the prefix budget the screen degrades to the LSH prescreen") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and AGAIN", // near-identical
      3L -> "completely unrelated words describing some other topic entirely now",
      4L -> "another unrelated document with different words and nothing shared here")
    val exact = TextDedup.jaccardPairs(d, 3, 0.5).as[(Long, Long, Double)].collect().toSet
    // zero budgets force: fanout → past tier 1, prefix → past tier 2
    val tier3 = TextDedup.jaccardPairsAdaptive(d, n = 3, threshold = 0.5,
        fanoutBudget = 0L, prefixBudget = 0L)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = TextDedup.minhashLshPairs(d, 3, 16, 8, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(tier3 == lsh, "tier 3 must be the banded-LSH prescreen path")
    assert(tier3.subsetOf(exact), "precision stays 1.0 (exact verify)")
    assert(tier3.exists(p => p._1 == 1L && p._2 == 2L), "blatant near-dup caught")
    // tier 2 still runs (and stays loss-less) when only the index budget trips
    val tier2 = TextDedup.jaccardPairsAdaptive(d, n = 3, threshold = 0.5, fanoutBudget = 0L)
      .as[(Long, Long, Double)].collect().toSet
    assert(tier2 == exact)
  }

  test("tier-3 containment dispatch: LSH prescreen + exact containment verify") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and AGAIN",
      3L -> "completely unrelated words describing some other topic entirely now")
    val exact = TextDedup.containmentPairs(d, n = 3, threshold = 0.8)
      .select($"doc_sub", $"doc_sup", $"containment").as[(Long, Long, Double)].collect().toSet
    val tier3 = TextDedup.containmentPairsAdaptive(d, n = 3, threshold = 0.8,
        fanoutBudget = 0L, prefixBudget = 0L)
      .select($"doc_sub", $"doc_sup", $"containment").as[(Long, Long, Double)].collect().toSet
    assert(tier3.subsetOf(exact), "precision stays 1.0")
    assert(tier3.exists(p => Set(p._1, p._2) == Set(1L, 2L)), "high-J containment caught")
  }

  test("tier-3 precision sweep: LSH-prescreen output ⊆ exact pairs on random corpora") {
    val words = Seq("the", "cat", "sat", "on", "mat", "dog", "ran", "red", "big", "sky")
    for (seed <- Seq(3, 17, 29)) {
      val rng = new scala.util.Random(seed)
      val corpus = (1L to 25L).map { i =>
        i -> Seq.fill(8 + rng.nextInt(8))(words(rng.nextInt(words.size))).mkString(" ")
      }
      val d = docs(corpus: _*)
      val exactJ = TextDedup.jaccardPairsIndex(d, n = 3, threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val t3J = TextDedup.jaccardPairsAdaptive(d, n = 3, threshold = 0.5,
          fanoutBudget = 0L, prefixBudget = 0L)
        .as[(Long, Long, Double)].collect().toSet
      assert(t3J.subsetOf(exactJ), s"seed $seed: jaccard tier-3 emitted a non-exact pair")
      val exactC = TextDedup.containmentPairs(d, n = 3, threshold = 0.8)
        .select($"doc_sub", $"doc_sup", $"containment")
        .as[(Long, Long, Double)].collect().toSet
      val t3C = TextDedup.containmentPairsAdaptive(d, n = 3, threshold = 0.8,
          fanoutBudget = 0L, prefixBudget = 0L)
        .select($"doc_sub", $"doc_sup", $"containment")
        .as[(Long, Long, Double)].collect().toSet
      assert(t3C.subsetOf(exactC), s"seed $seed: containment tier-3 emitted a non-exact pair")
    }
  }

  test("prefixFanout measures exactly the prefix self-join's candidate volume") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e g", 3L -> "x y z w v u")
    // Σ df² over the prefix index == rows the prefix equi-self-join shuffles
    val pf = TextDedup.prefixFanout(d, n = 3, threshold = 0.5)
    val idx = TextDedup.prefixIndex(d, n = 3, threshold = 0.5)
    val expected = idx.as("a").join(idx.as("b"), $"a.sh" === $"b.sh").count()
    assert(pf == expected && pf > 0)
  }

  test("minhashLshPairs is a subset of exact pairs and catches near-identical docs") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and AGAIN", // 1-word change
      3L -> "completely unrelated words describing some other topic entirely now")
    val exact = TextDedup.jaccardPairs(d, 3, 0.5).as[(Long, Long, Double)].collect().toSet
    val lsh = TextDedup.minhashLshPairs(d, 3, 16, 8, 0.5).as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains(exact.find(p => p._1 == 1L && p._2 == 2L).get))
  }

  /** Brute-force SimHash reference pairs. */
  private def bruteSimhash(d: DataFrame, maxHam: Int): Set[(Long, Long, Int)] = {
    val sims = TextDedup.withSimHash(d).select($"doc_id", $"simhash")
      .as[(Long, Long)].collect()
    (for {
      (ia, sa) <- sims; (ib, sb) <- sims if ia < ib
      ham = java.lang.Long.bitCount(sa ^ sb)
      if ham <= maxHam
    } yield (ia, ib, ham)).toSet
  }

  test("simhash pigeonhole blocking is exact for maxHamming 0..3") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val rng = new scala.util.Random(13)
    val corpus = (1L to 30L).map { i =>
      i -> Seq.fill(6 + rng.nextInt(6))(words(rng.nextInt(words.size))).mkString(" ")
    }
    val d = docs(corpus: _*)
    for (mh <- 0 to 3) {
      val got = TextDedup.simhashPairs(d, mh).as[(Long, Long, Int)].collect().toSet
      assert(got == bruteSimhash(d, mh), s"maxHamming $mh")
    }
  }

  test("winnowing: window minima with guard shapes, hand-computed example") {
    // doc1: 6 tokens -> 4 shingles, w=4 -> exactly one window = global min
    // doc2: 2 tokens (< n) -> empty
    val d = docs(1L -> "a b c d e f", 2L -> "a b")
    val out = TextDedup.withWinnowFingerprints(d, n = 3, w = 4)
      .select($"doc_id", $"winnow_fps").as[(Long, Seq[Long])].collect().toMap
    def sh(ws: Seq[String]): Long =
      ws.map(charFoldRef).foldLeft(0L)((a, h) => (a * 131 + h) % TextDedup.P)
    val shingles = Seq(
      sh(Seq("a", "b", "c")), sh(Seq("b", "c", "d")),
      sh(Seq("c", "d", "e")), sh(Seq("d", "e", "f")))
    assert(out(1L) == Seq(shingles.min))
    assert(out(2L).isEmpty)
  }

  test("winnowing guarantee: docs sharing a long passage share a fingerprint") {
    val passage = "one two three four five six seven eight nine ten"
    val d = docs(
      1L -> s"unrelated prefix words here $passage",
      2L -> s"$passage totally different suffix tokens now",
      3L -> "nothing in common with either of the others at all")
    val pairs = TextDedup.winnowOverlapPairs(d, n = 3, w = 4, minShared = 1)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("graft_winnow kernel == documented HOF form, bit-identically (corpus + adversarial edges)") {
    import graft.GraftFunctions
    GraftFunctions.register(spark)
    // real corpus: every doc at sf0.001, several (n, w) shapes
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    for ((n, w) <- Seq((3, 4), (2, 2), (4, 7), (1, 1))) {
      val th = TextDedup.withTokenHashes(corpus).select($"doc_id", $"token_hashes")
      val both = th.select($"doc_id",
          GraftFunctions.winnow($"token_hashes", n, w).as("kernel"),
          TextDedup.winnowFpsHof(n, w).as("hof"))
        .filter(not($"kernel" <=> $"hof"))
      assert(both.count() == 0, s"(n=$n, w=$w) kernel diverged from HOF")
    }
    // adversarial: null elements (null gram -> skipped by array_min;
    // all-null window -> null fp), short arrays, constant values,
    // exactly-one-window shapes, null array
    val edges = Seq(
      Seq[java.lang.Long](1L, 2L, 3L, 4L, 5L, 6L, 7L),
      Seq[java.lang.Long](1L, null, 3L, 4L, 5L, 6L),
      Seq[java.lang.Long](null, null, null, null, null),
      Seq[java.lang.Long](9L, 9L, 9L, 9L, 9L, 9L),
      Seq[java.lang.Long](5L, 4L, 3L, 2L, 1L),
      Seq[java.lang.Long](1L, 2L),
      Seq[java.lang.Long](7L),
      Seq[java.lang.Long]()).zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("doc_id", "token_hashes")
    for ((n, w) <- Seq((3, 4), (2, 3), (1, 2), (2, 1))) {
      val diff = edges.select($"doc_id",
          GraftFunctions.winnow($"token_hashes", n, w).as("kernel"),
          TextDedup.winnowFpsHof(n, w).as("hof"))
        .filter(not($"kernel" <=> $"hof"))
      assert(diff.count() == 0, s"adversarial (n=$n, w=$w) kernel diverged from HOF")
    }
    // the ONE documented divergence: a NULL token array. The HOF form
    // under legacy sizeOfNull (size(NULL) = -1 < n) yields []; the
    // kernel keeps the standard expression contract null-in → null-out.
    // No caller feeds null arrays (graft_token_hashes is null only for
    // null text, which the harness corpus excludes), and both shapes
    // vanish identically at the explode() every consumer applies.
    val nullRow = Seq((0L, null.asInstanceOf[Seq[java.lang.Long]]))
      .toDF("doc_id", "token_hashes")
      .select(GraftFunctions.winnow($"token_hashes", 3, 4).as("kernel"))
    assert(nullRow.head.isNullAt(0))
  }

  test("simhash separates lexically distinct docs and repeats weigh in (multiset)") {
    val d = docs(
      1L -> "apple apple apple banana",
      2L -> "apple apple apple banana",
      3L -> "zebra quasar nebula photon")
    val out = TextDedup.simhashPairs(d, maxHamming = 0)
      .as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((1L, 2L, 0)))
  }

  test("fast hash mode (xxHash64 mod P) finds the same pair sets as the portable mode") {
    // 10 base docs, each with a near-identical variant (one word changed)
    // plus unrelated singletons — pair detection must agree across hash
    // families even though every signature value differs
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rng = new scala.util.Random(41)
    val rows = (0 until 10).flatMap { i =>
      val base = Seq.fill(12)(words(rng.nextInt(words.size)))
      val variant = base.updated(rng.nextInt(base.size), "changed" + i)
      Seq(i * 2L -> base.mkString(" "), i * 2L + 1 -> variant.mkString(" "))
    } ++ (100L until 105L).map(i => i -> s"unrelated$i solitary${i * 7} text${i % 3} nothing shared here")
    val d = docs(rows: _*)

    def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
      df.as[(Long, Long, Double)].collect().toSet

    val jPortable = pairsOf(TextDedup.jaccardPairsIndex(d, n = 3, threshold = 0.5))
    val jFast = pairsOf(TextDedup.jaccardPairsIndex(d, n = 3, threshold = 0.5, fast = true))
    assert(jPortable == jFast)
    assert(jPortable.nonEmpty)

    // 16 bands of 1 row: per-pair miss probability (1-J)^16 < 1e-5 at
    // J >= 0.5, so both hash families must surface the same pairs (at
    // 8 bands x 2 rows, family-dependent banding luck legitimately
    // drops ~6% of borderline pairs - recall, not correctness)
    val mPortable = pairsOf(TextDedup.minhashLshPairs(d, n = 3, numHashes = 16, bands = 16))
    val mFast = pairsOf(TextDedup.minhashLshPairs(d, n = 3, numHashes = 16, bands = 16, fast = true))
    assert(mPortable == mFast)
    assert(mPortable == jPortable) // at this recall, LSH == exact on the fixture
    assert(mPortable.nonEmpty)

    // signatures themselves DO differ — fast mode is a different family
    val sigPortable = TextDedup.withMinHash(d, 3, 16).select($"doc_id", $"minhash")
      .as[(Long, Seq[Long])].collect().toMap
    val sigFast = TextDedup.withMinHash(d, 3, 16, fast = true).select($"doc_id", $"minhash")
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigPortable(0L) != sigFast(0L))
  }

  test("fast token hashes are STANDARD xxHash64 (published vectors + spec-derived values)") {
    // two layers of pinning for the production family, so the DuckDB
    // oracle (DataOps.dkFastTokCtes, an independent HUGEINT replay of
    // the xxHash64 spec) and the engine can only agree by both being
    // the real algorithm:
    // 1. Spark's XXH64 primitive matches the reference implementation's
    //    published seed-0 vectors (xxhash.h: XXH64("")=EF46DB3751D8E999,
    //    XXH64("a")=D24EC4F1A98C6E5B)
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    def xxh(s: String, seed: Long): Long = {
      val u = UTF8String.fromString(s)
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
    }
    assert(xxh("", 0L) == 0xEF46DB3751D8E999L)
    assert(xxh("a", 0L) == 0xD24EC4F1A98C6E5BL)
    // 2. TokenHashesFast output matches seed-42 mod-P values derived
    //    OFFLINE from an independent from-the-spec implementation
    //    (itself validated against the same published vectors) —
    //    exercising the 8-byte-chunk, 4-byte and tail-byte paths
    val expected = Map("the" -> 505947828L, "quick" -> 293009957L,
      "brown" -> 801021340L, "fox0fox1" -> 675167235L, "a" -> 340099599L,
      "" -> 907473664L, "jumped12" -> 528537971L, "over3456" -> 769719594L)
    val d = docs(1L -> expected.keys.toSeq.sorted.mkString(" "), 2L -> "a")
    val out = TextDedup.withTokenHashes(d, fast = true)
      .select($"doc_id", $"tokens", $"token_hashes")
      .as[(Long, Seq[String], Seq[Long])].collect()
    out.foreach { case (_, toks, hs) =>
      toks.zip(hs).foreach { case (w, h) =>
        // the fixture's doc 1 splits "" into a leading empty token only
        // when sorted first; guard on membership instead of position
        if (expected.contains(w)) assert(h == expected(w), s"token '$w'")
      }
    }
    assert(out.flatMap(_._2).count(expected.contains) >= expected.size)
  }

  test("fast family matches the portable family on the sf0.01 harness corpus") {
    // pair-set-equality gate for the production (xxHash64-mod-P) path,
    // ON TOP of its hard DuckDB oracle (dkFastTokCtes replays full
    // xxHash64 in HUGEINT arithmetic): the two families must also
    // AGREE with each other on real harness data
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def pairsAt(bands: Int, fast: Boolean): Set[(Long, Long)] =
      TextDedup.minhashLshPairs(corpus, n = 3, numHashes = 16, bands = bands,
          threshold = 0.5, fast = fast)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // 16 bands of 1 row: per-pair miss probability (1-J)^16 < 1e-5 at
    // J >= 0.5 ⇒ both families must surface the identical pair set
    assert(pairsAt(16, fast = false) == pairsAt(16, fast = true))
    // the benched 8-band config: family-dependent banding luck may
    // legitimately differ on borderline pairs, but every detected pair
    // is Jaccard-verified (subset of exact) and recall stays high
    val exact = TextDedup.jaccardPairsIndex(corpus, n = 3, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val fast8 = pairsAt(8, fast = true)
    assert(fast8.subsetOf(exact))
    assert(exact.nonEmpty && fast8.size >= exact.size * 9 / 10)
  }

  test("crossCorpusLshPairs equals the cross-restriction of the self-join pairs") {
    // disjoint corpora A (ids < 100) and B (ids >= 100) carved from the
    // harness documents; the incremental form against B must find the
    // SAME cross pairs the whole-union self-join finds (same family,
    // same banding, same verification)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id", $"text")
    val a = docs.filter($"doc_id" % 5 === 0)
    val b = docs.filter($"doc_id" % 5 =!= 0)
    val cross = TextDedup.crossCorpusLshPairs(a, b, n = 3, numHashes = 16,
        bands = 8, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val self = TextDedup.minhashLshPairs(docs, n = 3, numHashes = 16,
        bands = 8, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val expected = self.collect {
      case (x, y) if x % 5 == 0 && y % 5 != 0 => (x, y)
      case (x, y) if y % 5 == 0 && x % 5 != 0 => (y, x)
    }
    assert(cross == expected)
    assert(cross.nonEmpty, "fixture must actually produce cross pairs")
  }
}
