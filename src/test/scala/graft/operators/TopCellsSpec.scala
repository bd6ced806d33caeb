package graft.operators

import graft.{GraftFunctions, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity of the fused `graft_top_cells` kernel with the composed
  * literal-struct form it replaces (the form the DuckDB oracles
  * replay): same dots, same division shape, same (cos desc, cell asc)
  * order with Spark's double ordering — NaN greatest, NULL cosine
  * last. */
class TopCellsSpec extends SparkSpec {
  import spark.implicits._

  /** The composed reference form: slice(sort_array(struct(cos,
    * -cell), desc), 1, nProbe) → cells, exactly as ivfTopKTrained /
    * the pre-kernel ivfCandidates built it. */
  private def composedTopCells(df: DataFrame, centroids: Seq[(Int, Array[Double])],
      nProbe: Int, vecCol: String): org.apache.spark.sql.Column = {
    val v = col(vecCol)
    val scored = array(centroids.map { case (cid, c) =>
      val cl = typedLit(c.toSeq)
      struct((GraftFunctions.dot(v, cl) /
          (sqrt(GraftFunctions.dot(v, v)) * sqrt(GraftFunctions.dot(cl, cl)))).as("cos"),
        lit(-cid).as("negcell"))
    }: _*)
    transform(slice(sort_array(scored, asc = false), 1, nProbe),
      sc => -sc.getField("negcell"))
  }

  test("kernel == composed literal-struct form on the harness corpus (trained + seed centroids)") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val trained = KMeans.fit(emb, k = 8, nIter = 2)
    val seeds = KMeans.initCentroids(emb, 16)
    for ((cents, tag) <- Seq((trained, "trained8"), (seeds, "seed16")); p <- Seq(1, 2, 3)) {
      val diff = emb.select(
          GraftFunctions.topCells(col("embedding"), cents, p).as("kernel"),
          composedTopCells(emb, cents, p, "embedding").as("composed"))
        .filter(not($"kernel" <=> $"composed"))
      assert(diff.count() == 0, s"$tag nProbe=$p kernel diverged from composed form")
    }
  }

  test("fit-loop lean assign picks the same cell as assignCells") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = KMeans.fit(emb, k = 8, nIter = 1)
    val full = KMeans.assignCells(emb, cents)
      .select($"vec_id", $"cell".as("full_cell"))
    val lean = emb.select($"vec_id",
      element_at(GraftFunctions.topCells($"embedding", cents, 1), 1).as("lean_cell"))
    val diff = full.join(lean, "vec_id").filter($"full_cell" =!= $"lean_cell")
    assert(diff.count() == 0)
  }

  test("edges: zero vector (NaN cosine), null element, length mismatch, nProbe > k") {
    GraftFunctions.register(spark)
    val cents = Seq(3 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0), 7 -> Array(0.6, 0.8))
    val rows = Seq(
      (1L, Seq[java.lang.Float](1f, 0f)),      // clean: cell 3 first
      (3L, Seq[java.lang.Float](1f, null)),    // null element: all cos NULL -> cell asc (null ties)
      (4L, Seq[java.lang.Float](1f, 2f, 3f))   // length mismatch: all cos NULL
    ).toDF("id", "v")
    val got = rows.select($"id",
        GraftFunctions.topCells($"v", cents, 2).as("kernel"),
        composedTopCells(rows, cents, 2, "v").as("composed"))
      .orderBy($"id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"id ${r.getLong(0)} null mismatch")
      if (!r.isNullAt(1))
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"id ${r.getLong(0)}: kernel ${r.getSeq[Int](1)} vs composed ${r.getSeq[Int](2)}")
    }
    // zero vector: the composed form RAISES under ANSI (double
    // DIVIDE_BY_ZERO); the kernel keeps IEEE semantics — cosines all
    // NaN, NaN ties break to cell asc — i.e. the non-ANSI composed
    // behavior. Pinned directly, not vs the composed form.
    val zero = Seq((2L, Seq[java.lang.Float](0f, 0f))).toDF("id", "v")
      .select(GraftFunctions.topCells($"v", cents, 2).as("k")).head.getSeq[Int](0)
    assert(zero == Seq(1, 3))
    // null VECTOR: the composed form ranks on all-NULL cosines (cells
    // by id asc); the kernel keeps the standard expression contract
    // null-in → null. Documented divergence — no caller probes a null
    // vector, and explode(NULL) and explode of a bogus ranking both
    // produce no usable candidate.
    val nul = Seq((5L, null.asInstanceOf[Seq[java.lang.Float]])).toDF("id", "v")
      .select(GraftFunctions.topCells($"v", cents, 2).as("k"))
    assert(nul.head.isNullAt(0))
    // nProbe beyond k returns all cells, ranked
    val all = rows.filter($"id" === 1L)
      .select(GraftFunctions.topCells($"v", cents, 9).as("k")).head.getSeq[Int](0)
    assert(all.length == 3 && all.head == 3)
  }
}
