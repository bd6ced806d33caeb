package graft

import graft.functions.{Cols, TextHashes}
import graft.operators.{TextDedup, Upsert}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY §5 test plan): hash-key
  * determinism, top-k ⊆ sort prefix, upsert algebra, portable-hash
  * agreement between the native kernel and an independent fold.
  * (scalatestplus bridge is not in the offline cache, so properties
  * sample ScalaCheck generators directly.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val seed = org.scalacheck.rng.Seed(42L)
  /** Evaluate the assertion over `n` samples of the generator. */
  private def forAll[A](gen: Gen[A], n: Int = 30)(body: A => Unit): Unit = {
    var s = seed
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, s).foreach { a => body(a); produced += 1 }
      s = s.next
      attempts += 1
    }
    assert(produced > 0, "generator produced no samples")
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), 30) { case (a, b) => body(a, b) }

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  test("native char-fold hash agrees with an independent Scala fold for arbitrary strings") {
    forAll(Gen.listOf(Gen.asciiPrintableStr), 30) { (ws: List[String]) =>
      val expected = ws.map(w => w.codePoints().toArray
        .foldLeft(0L)((a, c) => (a * 31 + c) % TextDedup.P))
      assert(ws.map(TextHashes.foldString) == expected)
    }
  }

  test("hashKey is deterministic and injective on distinct simple keys") {
    forAll(Gen.listOfN(20, word), 10) { (keys: List[String]) =>
      val df = keys.distinct.toDF("k")
      val hashes = df.select(Cols.hashKey($"k")).as[String].collect()
      assert(hashes.distinct.length == keys.distinct.length)
      val again = df.select(Cols.hashKey($"k")).as[String].collect()
      assert(hashes.toSeq == again.toSeq)
    }
  }

  test("top-k is a prefix of the full descending sort") {
    forAll(Gen.listOfN(30, Gen.chooseNum(-1000000, 1000000)), Gen.chooseNum(1, 10)) {
      (xs: List[Int], k: Int) =>
        val df = xs.zipWithIndex.toDF("v", "i")
        val full = df.orderBy($"v".desc, $"i".asc).select($"i").as[Int].collect().toSeq
        val topk = df.orderBy($"v".desc, $"i".asc).limit(k).select($"i").as[Int].collect().toSeq
        assert(topk == full.take(k))
    }
  }

  test("upsertBatch: source rows always win, key set is the union, re-apply is a no-op") {
    val kv = Gen.listOf(Gen.zip(Gen.chooseNum(0, 20), word))
    forAll(kv, kv) { (t: List[(Int, String)], s: List[(Int, String)]) =>
      // one row per key (upsert precondition, enforced upstream by dedupe)
      val target = t.toMap.toSeq.toDF("k", "v")
      val source = s.toMap.toSeq.toDF("k", "v")
      val out = Upsert.upsertBatch(target, source, Seq("k")).as[(Int, String)].collect().toMap
      assert(out.keySet == t.toMap.keySet ++ s.toMap.keySet)
      s.toMap.foreach { case (k, v) => assert(out(k) == v) }
      (t.toMap -- s.toMap.keys).foreach { case (k, v) => assert(out(k) == v) }
      val again = Upsert.upsertBatch(out.toSeq.toDF("k", "v"), source, Seq("k"))
        .as[(Int, String)].collect().toMap
      assert(again == out)
    }
  }

  test("mergePartitionedPath == in-memory model over random batch sequences (moves, new/emptied partitions)") {
    // model-based check of the key-indexed partition-scoped MERGE: a
    // sequence of random batches — keys from a small pool so batches
    // update, move partitions, and insert; partitions from a small
    // date pool so some empty out — applied via mergePartitionedPath
    // must equal a driver-side map model keyed the same way. Exercises
    // index creation, over-inclusive widening, candidate pruning,
    // fallback/rebuild, and emptied-partition deletion together.
    val batchGen = Gen.listOfN(6, Gen.zip(
      Gen.chooseNum(1, 12), Gen.oneOf("2024-01-01", "2024-01-02", "2024-02-01"),
      Gen.identifier))
    forAll(Gen.listOfN(4, batchGen), 6) { batches =>
      val work = java.nio.file.Files.createTempDirectory("pmerge-prop")
      val path = work.toString + "/fact"
      try {
        var model = Map.empty[Int, (String, String)]
        batches.foreach { b =>
          val src = b.map { case (k, d, v) => (k, d, v) }
            // a batch must not carry duplicate keys (MERGE semantics
            // assume one row per key per batch) — keep the last
            .groupBy(_._1).map(_._2.last).toSeq
          Upsert.mergePartitionedPath(spark, path,
            src.toDF("k", "d", "v"), Seq("k"), "d")
          model = model ++ src.map { case (k, d, v) => k -> (d, v) }
          val got = spark.read.parquet(path)
            .select($"k", $"d".cast("string"), $"v").as[(Int, String, String)]
            .collect().map { case (k, d, v) => k -> (d, v) }.toMap
          assert(got == model)
        }
      } finally graft.sources.LocalFs.deleteRecursively(work)
    }
  }

  test("mergePartitionedManifest == in-memory model over random batch sequences (manifest commits)") {
    // the same model-based discipline that caught the r13 in-place
    // data-loss bug, pointed at the MANIFEST-committed merge: random
    // batches (updates, partition moves, inserts, emptied partitions)
    // through mergePartitionedManifest + readManifest must equal the
    // driver-side map model. Exercises generation installs, the
    // one-file commit, N-1 retention GC, and the shared key-index
    // machinery across generations.
    val batchGen = Gen.listOfN(6, Gen.zip(
      Gen.chooseNum(1, 12), Gen.oneOf("2024-01-01", "2024-01-02", "2024-02-01"),
      Gen.identifier))
    forAll(Gen.listOfN(4, batchGen), 6) { batches =>
      val work = java.nio.file.Files.createTempDirectory("mmerge-prop")
      val path = work.toString + "/fact"
      try {
        var model = Map.empty[Int, (String, String)]
        batches.foreach { b =>
          val src = b.map { case (k, d, v) => (k, d, v) }
            .groupBy(_._1).map(_._2.last).toSeq
          Upsert.mergePartitionedManifest(spark, path,
            src.toDF("k", "d", "v"), Seq("k"), "d")
          model = model ++ src.map { case (k, d, v) => k -> (d, v) }
          val got = Upsert.readManifest(spark, path)
            .select($"k", $"d".cast("string"), $"v").as[(Int, String, String)]
            .collect().map { case (k, d, v) => k -> (d, v) }.toMap
          assert(got == model)
        }
      } finally graft.sources.LocalFs.deleteRecursively(work)
    }
  }

  test("portable rounding r is idempotent and within half-ulp of the target grid") {
    forAll(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0, 6)) { (x: Double, d: Int) =>
      val once = Seq(x).toDF("x").select(Cols.r($"x", d)).as[Double].head()
      val twice = Seq(once).toDF("x").select(Cols.r($"x", d)).as[Double].head()
      assert(once == twice)
      assert(math.abs(once - x) <= 0.5 / math.pow(10, d) + math.ulp(x))
    }
  }

  test("sharding partitions the corpus: every id lands in exactly one shard, positions are 1..size") {
    forAll(Gen.zip(Gen.chooseNum(1, 12), Gen.chooseNum(20, 120), Gen.identifier), 6) {
      case (nShards: Int, nDocs: Int, seedStr: String) =>
        val ids = (0 until nDocs).map(_.toLong)
        val df = ids.toDF("doc_id")
        val placed = graft.operators.Sharding.withPosition(
          graft.operators.Sharding.withShard(df, "doc_id", nShards, seedStr), "doc_id")
          .select($"doc_id", $"shard", $"pos").as[(Long, Int, Int)].collect()
        assert(placed.map(_._1).sorted.toSeq == ids, "every id exactly once")
        assert(placed.forall(r => r._2 >= 0 && r._2 < nShards))
        placed.groupBy(_._2).foreach { case (_, rs) =>
          assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq)
        }
    }
  }

  test("packing conserves tokens and never under-allocates sequences, for random doc lengths") {
    forAll(Gen.zip(Gen.listOfN(60, Gen.chooseNum(1, 900)), Gen.chooseNum(16, 512)), 6) {
      case (lens: List[Int], seqLen: Int) =>
        val docs = lens.zipWithIndex.map { case (n, i) => (i.toLong, n.toLong) }
          .toDF("doc_id", "n")
        val s = graft.operators.Packing.packSummary(docs, "doc_id", $"n",
            nShards = 4, seed = "p", seqLen = seqLen)
          .as[(Int, Long, Long, Long, Long)].collect()
        assert(s.map(_._3).sum == lens.map(_.toLong).sum, "token conservation")
        s.foreach { case (_, docsN, tokens, nSeqs, splits) =>
          assert(nSeqs == (tokens + seqLen - 1) / seqLen)
          assert(splits <= docsN)
        }
    }
  }

  test("triangle counts equal the brute-force closed form on random graphs") {
    forAll(Gen.zip(Gen.chooseNum(5, 25), Gen.chooseNum(1L, 9999L)), 6) {
      case (n: Int, gseed: Long) =>
        val rng = new scala.util.Random(gseed)
        // Erdős–Rényi-ish edges, deliberately messy: duplicates in both
        // orientations and self-loops survive generation
        val edges = (for {
          a <- 0 until n; b <- 0 until n
          if a <= b && rng.nextDouble() < 0.3
        } yield (a.toLong, b.toLong)) ++ Seq((1L, 1L))
        val adj = Array.fill(n, n)(false)
        edges.foreach { case (a, b) =>
          if (a != b) { adj(a.toInt)(b.toInt) = true; adj(b.toInt)(a.toInt) = true }
        }
        val expected = (for {
          i <- 0 until n; j <- i + 1 until n if adj(i)(j)
          k <- j + 1 until n if adj(i)(k) && adj(j)(k)
        } yield Seq(i, j, k)).flatten
          .groupBy(identity).map { case (id, ts) => id.toLong -> ts.size.toLong }
        val shuffled = rng.shuffle(edges.map(e => if (rng.nextBoolean()) e.swap else e))
        val got = graft.operators.Triangles.nodeTriangles(
            shuffled.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"n=$n seed=$gseed")
    }
  }

  test("span dedup agrees with a brute-force string-gram reference on random corpora") {
    val n = 3
    val wordG = Gen.oneOf("aa", "bb", "cc", "dd") // tiny vocab forces shared runs
    val docG = Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, wordG).map(_.mkString(" ")))
    forAll(Gen.chooseNum(2, 5).flatMap(m => Gen.listOfN(m, docG)), 8) { (texts: List[String]) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.operators.SpanDedup.duplicatedSpans(df, n)
        .select($"doc_id", $"span_start".cast("int"), $"span_end".cast("int"))
        .as[(Long, Int, Int)].collect().toSet
      // reference: string-equality grams, ≥2 distinct docs, interval merge
      val toks = texts.map(_.split(" ").toSeq)
      val grams = toks.zipWithIndex.flatMap { case (ts, d) =>
        ts.sliding(n).filter(_.size == n).zipWithIndex
          .map { case (g, p) => (g.mkString(" "), d.toLong, p + 1) }
      }
      val dupG = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val expected = grams.filter(g => dupG(g._1)).groupBy(_._2).flatMap { case (d, ps) =>
        val sorted = ps.map(_._3).sorted
        val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
        sorted.foreach { p =>
          if (spans.nonEmpty && p <= spans.last._2) {
            val (s, e) = spans.remove(spans.length - 1); spans += ((s, math.max(e, p + n)))
          } else spans += ((p, p + n))
        }
        spans.map { case (s, e) => (d, s, e) }
      }.toSet
      assert(got == expected, s"texts=$texts")
      // excision invariant: kept tokens = tokens at uncovered positions, in order
      val cleaned = graft.operators.SpanDedup.excised(df, n)
        .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
      toks.zipWithIndex.foreach { case (ts, d) =>
        val covered = expected.collect { case (dd, s, e) if dd == d.toLong =>
          (s to (e - 1)) }.flatten.toSet
        val ref = ts.zipWithIndex.collect { case (t, i) if !covered(i + 1) => t }.mkString(" ")
        assert(cleaned(d.toLong) == ref, s"doc=$d texts=$texts")
      }
    }
  }

  test("exactCut equals the sorted order statistic for arbitrary doubles and probabilities") {
    val xs = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose(-1e9, 1e9),
      Gen.choose(-1.0, 1.0),
      Gen.choose(0, 9).map(_.toDouble))) // heavy duplicate mass
    val p = Gen.choose(0.05, 0.95)
    forAll(Gen.zip(xs, p), 15) { case (vals, prob) =>
      val got = graft.operators.HistQuantiles
        .exactCut(vals.toDF("x"), $"x", prob, nBuckets = 8).head()
      val expect = vals.sorted.apply(math.floor(prob * (vals.size - 1)).toInt)
      assert(got.getDouble(0) == expect && got.getLong(1) == vals.size,
        s"p=$prob n=${vals.size}")
    }
  }

  test("MG summary merge is partition-shape independent in its guarantee and error bound") {
    val items = Gen.listOfN(400, Gen.choose(0, 30).map {
      case k if k < 3 => "hot" + k          // three heavy items
      case k          => "cold" + k
    })
    forAll(Gen.zip(items, Gen.choose(1, 10)), 10) { case (vals, parts) =>
      val k = 8
      val n = vals.size.toLong
      val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val mg = udaf(graft.operators.HeavyHitters.mgAgg(k))
      val summary = vals.toDF("item").repartition(parts)
        .agg(mg($"item")).head().getMap[String, Long](0)
      assert(summary.size <= k)
      truth.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { hh =>
        assert(summary.contains(hh), s"parts=$parts lost $hh")
      }
      summary.foreach { case (item, c) =>
        assert(c <= truth(item) && truth(item) - c <= n / (k + 1) + 1, item)
      }
    }
  }

  test("int8 quantization error is within half a quantization step, per element") {
    val rng = new scala.util.Random(23)
    val df = (1L to 150L).map(i => (i, Seq.fill(24)(rng.nextFloat() * 1000 - 500)))
      .toDF("vec_id", "embedding")
    val rows = graft.operators.Quantize.quantizeVectors(df)
      .select($"embedding", $"q8", $"qscale")
      .as[(Seq[Float], Seq[Int], Double)].collect()
    rows.foreach { case (v, q, scale) =>
      assert(scale > 0.0)
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x.toDouble * scale - qi) <= 0.5 + 1e-9, s"x=$x qi=$qi scale=$scale")
      }
    }
  }
}
