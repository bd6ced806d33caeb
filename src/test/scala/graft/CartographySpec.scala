package graft
// (zipf/keyword additions below reuse this spec's fixtures)

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Cartography, Relevance}

/** Unit semantics for the dataset-cartography operators (the catalog
  * twins tfidf_topk / rarity_profile / embed_label_centroids are
  * hash-gated against DuckDB; these pin hand-computable cases and
  * edges the harness corpus may not exercise). */
class CartographySpec extends SparkSpec {

  import spark.implicits._

  // ---- TF-IDF --------------------------------------------------------

  private def docsOf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "source")

  test("tfidf: ubiquitous term contributes zero; rare term repetition grows log-tf") {
    val docs = docsOf(
      (1L, "common rare rare rare", "s"),
      (2L, "common rare", "s"),
      (3L, "common filler filler", "s"))
    val out = Relevance.tfidfTopK(docs, Seq("common", "rare"), 3).collect()
    // 'common' is in all 3 docs: ln(3/3) = 0 — only 'rare' scores.
    // doc1: (1 + ln 3)·ln(3/2); doc2: (1 + ln 1)·ln(3/2); doc3: 0.
    val idf = math.log(3.0 / 2.0)
    def q(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getDouble(1) == q((1.0 + math.log(3.0)) * idf))
    assert(out(1).getDouble(1) == q(idf))
    assert(out(2).getDouble(1) == 0.0)
  }

  test("tfidf: top-k cut breaks score ties by doc_id ascending") {
    val docs = docsOf(
      (5L, "rare x", "s"), (2L, "rare y", "s"), (9L, "rare z", "s"),
      (7L, "none here", "s"))
    val out = Relevance.tfidfTopK(docs, Seq("rare"), 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 5L))
  }

  // ---- rarity profile ------------------------------------------------

  test("rarityProfile: all-unique doc lands in bucket 10, fully-shared docs in bucket 0") {
    val docs = docsOf(
      (1L, "a b c d", "s1"),   // shingles {abc, bcd} — shared with doc 2
      (2L, "a b c d", "s1"),   // identical → df 2 on both → rarity 0
      (3L, "p q r s", "s2"))   // {pqr, qrs} unique → rarity 1000 → bucket 10
    val out = Cartography.rarityProfile(docs, n = 3).collect()
    val byKey = out.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byKey(("s1", 0L)) == ((2L, 4L, 0L)))   // 2 docs, 2+2 shingles, 0 unique
    assert(byKey(("s2", 10L)) == ((1L, 2L, 2L)))  // 1 doc, 2 shingles, both unique
    assert(out.length == 2)
  }

  test("rarityProfile: docs shorter than n tokens are excluded; mixed doc buckets correctly") {
    val docs = docsOf(
      (1L, "a b", "s"),              // 2 tokens < 3 → no shingles → absent
      (2L, "a b c x y z", "s"),      // {abc, bcx, cxy, xyz} — abc shared
      (3L, "a b c", "s"))            // {abc} shared → rarity 0
    val out = Cartography.rarityProfile(docs, n = 3).collect()
    val byKey = out.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc2: 4 shingles, 3 unique → 750‰ → bucket 7; doc3: bucket 0
    assert(byKey(("s", 7L)) == ((1L, 4L, 3L)))
    assert(byKey(("s", 0L)) == ((1L, 1L, 0L)))
    assert(out.map(_.getLong(2)).sum == 2L) // doc1 contributed nowhere
  }

  // ---- label centroids ----------------------------------------------

  private def embOf(rows: (Long, Seq[Float], Int)*) =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  test("labelCentroids: identical members give cohesion 1e6 and the member's norm") {
    val emb = embOf(
      (1L, Seq(0.6f, 0.8f), 1), (2L, Seq(0.6f, 0.8f), 1),
      (3L, Seq(1.0f, 0.0f), 2))
    val out = Cartography.labelCentroids(emb).collect()
    val byLabel = out.map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // label 1: centroid == member direction → cos = 1 exactly (micro 1e6);
    // norm = 1.0 in micro units (0.6f/0.8f quantize to 600000/800000).
    assert(byLabel(1) == ((2L, 1000000L, 1000000L)))
    assert(byLabel(2) == ((1L, 1000000L, 1000000L)))
  }

  test("labelCentroids: opposite members cancel — zero centroid, zero cosines") {
    val emb = embOf(
      (1L, Seq(1.0f, 0.0f), 7), (2L, Seq(-1.0f, 0.0f), 7))
    val Array(r) = Cartography.labelCentroids(emb).collect()
    assert((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((7, 2L, 0L, 0L)))
  }

  test("labelCentroids: null and empty embeddings are excluded from their label") {
    val emb = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq(0.0f, 1.0f), 3), Row(2L, null, 3), Row(3L, Seq.empty[Float], 3)),
      embOf((1L, Seq(0f), 1)).schema)
    val Array(r) = Cartography.labelCentroids(emb).collect()
    assert(r.getLong(1) == 1L) // only the real vector counted
    assert(r.getLong(3) == 1000000L)
  }

  test("labelCentroids: orthogonal pair — cohesion cos 45° toward the shared centroid") {
    val emb = embOf((1L, Seq(1.0f, 0.0f), 4), (2L, Seq(0.0f, 1.0f), 4))
    val Array(r) = Cartography.labelCentroids(emb).collect()
    // centroid direction (1,1)/√2: each member's cosine = 1/√2 ≈ 0.707107
    assert(r.getLong(3) == math.floor(1e6 / math.sqrt(2.0) + 0.5).toLong)
    // ‖centroid‖ = √2/2 → micro 707107
    assert(r.getLong(2) == 707107L)
  }

  // ---- zipf slope ----------------------------------------------------

  test("zipfSlope: an exact power law f = C/rank recovers slope -1 and ln C") {
    // ranks 1..4 with counts 24, 12, 8, 6 = 24/rank
    val words = Seq("a" -> 24, "b" -> 12, "c" -> 8, "d" -> 6)
    val text = words.flatMap { case (w, c) => Seq.fill(c)(w) }.mkString(" ")
    val docs = docsOf((1L, text, "s"))
    val Array(r) = Cartography.zipfSlope(docs, topRanks = 256).collect()
    assert((r.getLong(0), r.getLong(1)) == ((4L, 6L)))
    assert(r.getLong(2) == -1000000L)             // slope exactly -1
    assert(r.getLong(3) == math.floor(math.log(24.0) * 1e6 + 0.5).toLong)
  }

  test("zipfSlope: a flat head (all counts equal) fits slope 0") {
    val docs = docsOf((1L, "a b c d", "s"), (2L, "d c b a", "s"))
    val Array(r) = Cartography.zipfSlope(docs, topRanks = 256).collect()
    assert(r.getLong(2) == 0L)
  }

  test("zipfSlope: topRanks caps the fitted head deterministically") {
    // head 60/rank (60, 30, 20) is an exact power law; the excluded
    // tail words (5, 1) would break it if the cap leaked
    val words = Seq("w1" -> 60, "w2" -> 30, "w3" -> 20, "w4" -> 5, "w5" -> 1)
    val text = words.flatMap { case (w, c) => Seq.fill(c)(w) }.mkString(" ")
    val Array(r) = Cartography.zipfSlope(docsOf((1L, text, "s")), topRanks = 3).collect()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getLong(2) == -1000000L)
  }

  // ---- character entropy ---------------------------------------------

  test("charEntropyProfile: single-character junk lands in bucket 0 with H = 0") {
    val docs = docsOf((1L, "aaaaaaaa", "junk"))
    val Array(r) = Cartography.charEntropyProfile(docs).collect()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (("junk", 0L, 1L, 0L)))
  }

  test("charEntropyProfile: uniform alphabet hits ln(k) nats exactly") {
    // "abcd" -> 4 chars each p = 1/4 -> H = ln 4 ≈ 1.386294 nats -> bucket 5
    val docs = docsOf((1L, "abcd", "s"))
    val Array(r) = Cartography.charEntropyProfile(docs).collect()
    val expected = 4L * math.floor(0.25 * math.log(4.0) * 1e9 + 0.5).toLong
    assert(r.getLong(3) == expected)
    assert(r.getLong(1) == expected / 250000000L)
  }

  test("charEntropyProfile: NULL and empty docs are excluded; buckets split per source") {
    val docs = docsOf(
      (1L, "aaaa", "s"),            // H = 0 -> bucket 0
      (2L, "abcdefgh", "s"),        // H = ln 8 ≈ 2.079 -> bucket 8
      (3L, null.asInstanceOf[String], "s"),
      (4L, "", "s"))
    val out = Cartography.charEntropyProfile(docs).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted ==
      Seq((0L, 1L), (8L, 1L)))
  }

  // ---- distinct-n diversity ------------------------------------------

  test("distinctNgramDiversity: looped text scores low distinct-2, varied text high") {
    val docs = docsOf(
      (1L, "a b a b a b", "loop"),     // 1-grams: 6 inst / 2 distinct;
                                       // 2-grams: 5 inst / 2 distinct (a b, b a)
      (2L, "p q r s t u", "varied"))   // all distinct at every n
    val out = Cartography.distinctNgramDiversity(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("loop", 1L)) == ((6L, 2L, math.floor(2.0 / 6 * 1e6 + 0.5).toLong)))
    assert(out(("loop", 2L)) == ((5L, 2L, 400000L)))
    assert(out(("varied", 2L)) == ((5L, 5L, 1000000L)))
    assert(out(("varied", 3L)) == ((4L, 4L, 1000000L)))
  }

  test("distinctNgramDiversity: n-grams never cross documents") {
    // two docs of one token each: no 2-grams at all
    val docs = docsOf((1L, "x", "s"), (2L, "y", "s"))
    val out = Cartography.distinctNgramDiversity(docs).collect()
    assert(out.map(_.getLong(1)).toSet == Set(1L))
  }

  // ---- burstiness ----------------------------------------------------

  test("burstinessTopK: concentrated word out-bursts the evenly spread one") {
    // 6 docs; 'even' once in each (VMR < 1); 'bursty' 6 times in one
    // doc (VMR >> 1); both have total 6 over D = 6 -> mu = 1
    val docs = docsOf(
      (1L, "even bursty bursty bursty bursty bursty bursty", "s"),
      (2L, "even", "s"), (3L, "even", "s"), (4L, "even", "s"),
      (5L, "even", "s"), (6L, "even", "s"))
    val out = Cartography.burstinessTopK(docs, k = 10, minDf = 1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // bursty: E[c^2] = 36/6 = 6, mu = 1 -> VMR = 5
    assert(out("bursty") == ((1L, 6L, 5000000L)))
    // even: E[c^2] = 1, mu = 1 -> VMR = 0 (deterministic word has no variance)
    assert(out("even") == ((6L, 6L, 0L)))
  }

  test("burstinessTopK: minDf excludes rare words; k cuts deterministically") {
    val docs = docsOf(
      (1L, "common rare", "s"), (2L, "common", "s"),
      (3L, "common", "s"), (4L, "common", "s"), (5L, "common", "s"))
    val out = Cartography.burstinessTopK(docs, k = 10, minDf = 5).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("common"))
  }

  // ---- per-source keywords -------------------------------------------

  test("keywordsPerSource: distinctive terms win; ubiquitous terms score zero") {
    val docs = docsOf(
      (1L, "shared alpha alpha", "s1"),
      (2L, "shared beta", "s2"))
    val out = Cartography.keywordsPerSource(docs, k = 2).collect()
    val byKey = out.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getString(2), r.getLong(3))).toMap
    val idf2 = math.log(2.0)
    // s1 rank 1: alpha with (1 + ln 2)·ln 2
    assert(byKey(("s1", 1L)) ==
      (("alpha", math.floor((1.0 + math.log(2.0)) * idf2 * 1e6 + 0.5).toLong)))
    // 'shared' in both sources: ln(2/2) = 0 → rank 2 by term asc among zeros
    assert(byKey(("s1", 2L))._2 == 0L)
    assert(byKey(("s2", 1L)) == (("beta", math.floor(idf2 * 1e6 + 0.5).toLong)))
  }

  test("keywordsPerSource: k bounds rows per source; ties order by term ascending") {
    val docs = docsOf(
      (1L, "x y z shared", "s1"),
      (2L, "shared", "s2"))
    val out = Cartography.keywordsPerSource(docs, k = 2)
      .filter(col("source") === "s1").collect()
    // x, y, z all score (1+ln1)·ln2 — tie broken by term asc, k = 2 cuts z
    assert(out.map(_.getString(2)).toSeq == Seq("x", "y"))
  }
}
