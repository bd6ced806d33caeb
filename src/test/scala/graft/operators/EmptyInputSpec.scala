package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input hardening: a pipeline stage receiving an empty
  * upstream (a filter that matched nothing, a day with no data) must
  * yield an empty/zero result, never a crash — except where an empty
  * input is a genuine contract violation, which must fail FAST with
  * the documented error rather than produce garbage downstream. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
  private def emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")

  test("text dedup operators yield empty results on an empty corpus") {
    assert(TextDedup.jaccardPairsIndex(emptyDocs).count() == 0)
    assert(TextDedup.jaccardPairs(emptyDocs).count() == 0)
    // adaptive dispatch: empty index ⇒ NULL Σdf² ⇒ fanout 0 ⇒ index branch
    assert(TextDedup.jaccardPairsAdaptive(emptyDocs).count() == 0)
    assert(TextDedup.minhashLshPairs(emptyDocs).count() == 0)
    assert(TextDedup.simhashPairs(emptyDocs).count() == 0)
    assert(TextDedup.winnowOverlapPairs(emptyDocs).count() == 0)
    val s = TextDedup.exactDedupSummary(emptyDocs).collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == ((0L, 0L, 0L)))
    assert(Passages.withOccurrenceCounts(emptyDocs, 4).count() == 0)
    assert(Passages.boilerplateTopK(emptyDocs, 4, 10).count() == 0)
  }

  test("graph operators yield empty results on an empty edge list") {
    assert(Components.dedupGroups(emptyPairs).count() == 0)
    assert(Triangles.nodeTriangles(emptyPairs, "doc_a", "doc_b").count() == 0)
    assert(PageRank.ranks(emptyPairs, "doc_a", "doc_b", nIter = 2).count() == 0)
  }

  test("sketches degrade to zero estimates on empty input") {
    val out = Sketches.kmvEstimate(emptyDocs, $"text", 8).collect().head
    assert(out.getAs[Long]("m") == 0L && out.getAs[Long]("n_est") == 0L)
    val hll = Sketches.hllDistinct(emptyDocs, $"text", 64).collect().head
    assert(hll.getAs[Long]("n_est") == 0L)
    assert(Sketches.hllDistinctBy(emptyDocs, $"doc_id", $"text", 64).count() == 0)
  }

  test("curation/contamination/skew pass empties through") {
    val emptyBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Contamination.overlapPairs(emptyDocs, emptyBench).count() == 0)
    assert(Contamination.decontaminate(emptyDocs, emptyBench).count() == 0)
    // empty BENCHMARK against a real corpus: nothing is contaminated
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    assert(Contamination.decontaminate(docs, emptyBench).count() == 1)
    val emptyFact = Seq.empty[(Int, Int)].toDF("k", "v")
    val dim = Seq((1, "x")).toDF("k", "name")
    assert(SkewJoin.saltedJoin(emptyFact, dim, Seq("k")).count() == 0)
    assert(SkewJoin.joinSkewSafe(emptyFact, dim, Seq("k"), sampleFraction = 1.0).count() == 0)
  }

  test("quantiles/sampling/LM pass empties through") {
    val emptyW = Seq.empty[(Long, Double)].toDF("doc_id", "w")
    assert(Curation.prioritySample(emptyW, "doc_id", $"w", k = 5).count() == 0)
    val emptyKX = Seq.empty[(String, Double)].toDF("g", "x")
    assert(HistQuantiles.groupedCut(emptyKX, $"g", $"x", 0.5, 64, "med").count() == 0)
    assert(LanguageModel.surprisalScores(emptyDocs, emptyDocs).count() == 0)
    // empty REFERENCE with a non-empty corpus: no vocabulary means the
    // add-one model is undefined (p = 1/(0+0) trips the ANSI divide) —
    // the documented contract is an EMPTY result, not a crash
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(LanguageModel.surprisalScores(docs, emptyDocs).count() == 0)
  }

  test("multimodal demuxers reject or pass through degenerate payloads without crashing") {
    assert(Multimodal.wavInfo(Array.emptyByteArray).isEmpty)
    assert(Multimodal.wavInfo("RIFF".getBytes).isEmpty)
    assert(Multimodal.jpegFrameSpans(Array.emptyByteArray).isEmpty)
    assert(Multimodal.jpegFrameSpans(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
    assert(Multimodal.imageDims(Array.emptyByteArray).isEmpty)
  }

  test("video frame hash: empty corpus and wrong-width vectors yield empty, not a crash") {
    assert(Multimodal.embeddingVideoFrameHash(emptyVecs).count() == 0)
    // a 5-dim vector is not whole 4×4 frames — filtered out, not crashed on
    val odd = Seq((1L, Seq.fill(5)(0.1f))).toDF("vec_id", "embedding")
    assert(Multimodal.embeddingVideoFrameHash(odd).count() == 0)
    // a 16-dim vector IS one whole frame: exactly one row, t_ms 0
    val one = Seq((2L, Seq.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val rows = Multimodal.embeddingVideoFrameHash(one).collect()
    assert(rows.length == 1 && rows.head.getInt(1) == 0 && rows.head.getLong(2) == 0L)
  }

  test("similarity: seeded-plane paths pass empties through; corpus-anchor paths fail fast") {
    val planes = Some(Similarity.gaussianPlanes(1L, 8, 4))
    assert(Similarity.nearDupPairs(emptyVecs, 0.5, bands = 2, planesPerBand = 4,
      planesOpt = planes).count() == 0)
    assert(Similarity.lshTopK(emptyVecs, emptyVecs, k = 3, nPlanes = 8,
      planesOpt = planes).count() == 0)
    assert(Similarity.lshTopKMultiprobe(emptyVecs, emptyVecs, k = 3, nPlanes = 8,
      planesOpt = planes).count() == 0)
    assert(Similarity.bruteForceTopK(emptyVecs, emptyVecs, k = 3).count() == 0)
    // anchor planes come FROM the corpus: an empty corpus cannot
    // produce an index — documented contract, must throw, not return
    // an all-zero-bucket index that matches everything later
    intercept[IllegalArgumentException](Similarity.nearDupPairs(emptyVecs, 0.5))
  }

  test("r7 additions pass empties through") {
    val emptySrc = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val emptyLbl = Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label")
    // BPE: empty dict trains nothing on either path
    assert(Bpe.train(Bpe.wordDict(emptySrc), rounds = 3)._1.isEmpty)
    // cartography profiles: empty rollups
    assert(Cartography.rarityProfile(emptySrc).count() == 0)
    assert(Cartography.charEntropyProfile(emptySrc).count() == 0)
    assert(Cartography.keywordsPerSource(emptySrc).count() == 0)
    assert(Cartography.labelCentroids(emptyLbl).count() == 0)
    // zipf: the single stats row degrades to zero counts, null fit
    val z = Cartography.zipfSlope(emptySrc).collect().head
    assert(z.getLong(0) == 0L && (z.isNullAt(1) || z.getLong(1) == 0L) && z.isNullAt(2))
    // PCA: zero moments -> zero matrix -> zero vector; ABTT empty
    val (mom, u) = Pca.fit(emptyLbl, d = 4, rounds = 3)
    assert(mom.n == 0L && u.toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    assert(Pca.abttLabelStats(emptyLbl, 4, mom, u).count() == 0)
    // LPA: empty edge list -> empty labeling
    assert(Components.labelPropagation(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
  }
}
