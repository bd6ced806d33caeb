package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("fit converges to the cluster means on two well-separated clusters") {
    // ids 0 and 1 land in different clusters so the deterministic seed
    // (first k vectors) starts one centroid in each
    val d = vecs(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f),
      4L -> Seq(0.95f, 0.05f), 5L -> Seq(0.05f, 0.95f))
    val cents = KMeans.fit(d, k = 2, nIter = 3).toMap
    assert(cents.keySet == Set(0, 1))
    val c0 = cents(0); val c1 = cents(1)
    // cluster A mean ≈ (0.95, 0.05), cluster B mean ≈ (0.05, 0.95)
    assert(math.abs(c0(0) - 0.95) < 1e-6 && math.abs(c0(1) - 0.05) < 1e-6)
    assert(math.abs(c1(0) - 0.05) < 1e-6 && math.abs(c1(1) - 0.95) < 1e-6)
  }

  test("assignCells: nearest centroid wins; exact ties break to the LOWEST cell id") {
    val d = vecs(0L -> Seq(1f, 1f))
    val same = Array(1.0, 0.0)
    val out = KMeans.assignCells(d, Seq(0 -> Array(0.0, 1.0), 1 -> Array(0.0, 1.0), 2 -> same))
      .select($"cell").as[Int].head()
    // centroids 0 and 1 are identical (cos equal): must pick 0, and
    // centroid 2 has the same cosine to (1,1) as 0/1 — still 0
    assert(out == 0)
  }

  test("meanUpdate quantizes to the 1e-9 grid and drops empty cells") {
    val d = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    // both vectors closest to centroid 0; cell 1 goes empty
    val assigned = KMeans.assignCells(d, Seq(0 -> Array(0.5, 0.5), 1 -> Array(-1.0, -1.0)))
    val cents = KMeans.meanUpdate(assigned).toMap
    assert(cents.keySet == Set(0))
    assert(cents(0).toSeq == Seq(0.5, 0.5)) // exact: (1e9 + 0) / 2 / 1e9
  }

  test("fit is deterministic: two runs produce bit-identical centroids") {
    val rng = new scala.util.Random(41)
    val d = vecs((0L until 50L).map(i =>
      i -> Seq.fill(8)(rng.nextFloat() * 2 - 1)): _*)
    val a = KMeans.fit(d, k = 4, nIter = 2)
    val b = KMeans.fit(d, k = 4, nIter = 2)
    assert(a.map(_._1) == b.map(_._1))
    assert(a.zip(b).forall { case ((_, ca), (_, cb)) => ca.sameElements(cb) })
  }

  test("assignment is map-side: no exchange, join, or window in the plan") {
    // parquet-backed source: a local fixture constant-folds into a
    // LocalTableScan and the assertion would check an empty plan
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = KMeans.initCentroids(emb, 4)
    val p = KMeans.assignCells(emb, cents)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join") && !p.contains("Window"))
    assert(p.contains("graft_dot"))
  }
}
