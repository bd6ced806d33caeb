package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Candidate-volume and recall contract of the two embedding
  * near-dup paths, MEASURED on the harness tables.
  *
  * The claim this spec pins (and SCALE.md reports): at a permissive
  * threshold the banded-LSH parameterization `dedup_embedding` ships
  * (32 bands × 4 planes) produces a candidate set that is ~all pairs
  * — a RANDOM pair co-buckets in ≥ 1 band with probability
  * ≈ 1−(1−1/16)³² ≈ 0.87 — so its verify stage is O(n²) no matter
  * how clean the equi-join plan looks. The trained-IVF path
  * (`dedup_embedding_ivf`) keeps candidates at Σ occupancy² with
  * k ∝ N, which is linear in the corpus for a fixed target cell
  * size. Both paths verify with the same exact cosine tail, so
  * precision is 1.0 by construction; recall is the knob. */
class NearDupScaleSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"
  private val sf01 = "/root/testdata/sf0.1"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("vec_a").cast("long"), col("vec_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded 32x4 candidates at sf0.01 are ~all pairs (the measured quadratic signature)") {
    val emb = graft.Tables.embeddings(spark, sf001)
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    val planes = Similarity.gaussianPlanes(42L, 128, 64)
    val nCands = Similarity.bandedCandidates(emb, planes, planesPerBand = 4).count()
    info(f"banded candidates: $nCands of $allPairs all-pairs (${nCands.toDouble / allPairs}%.3f)")
    // analytic: 1-(1-1/16)^32 = 0.873 of all pairs for random keys;
    // clustered data co-buckets MORE, not less
    assert(nCands >= (allPairs * 0.5).toLong,
      s"expected ~all-pairs candidates, got $nCands of $allPairs")
  }

  test("IVF candidates are a small fraction of all pairs and recall holds where it matters") {
    val emb = graft.Tables.embeddings(spark, sf001)
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    val cents = KMeans.fit(emb, k = 64, nIter = 2)
    val nCands = Similarity.ivfCandidates(emb, cents, nProbe = 2).count()
    info(f"IVF candidates: $nCands of $allPairs all-pairs (${nCands.toDouble / allPairs}%.3f)")
    assert(nCands < allPairs / 4,
      s"IVF candidates $nCands should be well under all-pairs $allPairs")

    val exact = pairSet(Similarity.nearDupPairsExact(emb, 0.4))
    val ivf = pairSet(Similarity.nearDupPairsIVF(emb, 0.4, cents, nProbe = 2))
    // precision 1.0 by construction: every emitted pair passed the
    // same exact cosine verify the brute-force path applies
    assert(ivf.subsetOf(exact), s"${(ivf -- exact).size} pairs outside the exact set")
    // high-cosine pairs (the actual near-dup signal) must survive:
    // near-identical vectors rank the same cell first
    val strong = pairSet(Similarity.nearDupPairsExact(emb, 0.9))
    if (strong.nonEmpty) {
      val hit = strong.count(ivf.contains).toDouble / strong.size
      assert(hit >= 0.95, s"strong-pair recall $hit")
    }
    // and overall recall at the permissive threshold stays useful
    val recall = exact.count(ivf.contains).toDouble / math.max(exact.size, 1)
    info(f"recall at 0.4: $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.5, s"overall recall $recall")
  }

  test("candidates per vector stay flat across a 4x corpus growth when k scales with N") {
    val small = graft.Tables.embeddings(spark, sf001) // 500 vectors
    val big = graft.Tables.embeddings(spark, sf01)    // 2000 vectors
    val cs = KMeans.fit(small, k = 16, nIter = 2)
    val cb = KMeans.fit(big, k = 64, nIter = 2)
    val perVecSmall = Similarity.ivfCandidates(small, cs, nProbe = 2).count().toDouble / 500
    val perVecBig = Similarity.ivfCandidates(big, cb, nProbe = 2).count().toDouble / 2000
    info(f"candidates/vector: $perVecSmall%.1f @N=500,k=16 -> $perVecBig%.1f @N=2000,k=64")
    // linear scaling = constant candidates/vector; allow cluster-shape
    // wobble but rule out the quadratic signature (4x growth)
    assert(perVecBig <= perVecSmall * 2.0,
      s"candidates/vector grew $perVecSmall -> $perVecBig with k scaled 4x")
  }
}
