package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftFunctions

/** Feature-hashing vectorizer (the "hashing trick", Weinberger et al.,
  * ICML 2009): text → fixed-dimension feature vector with NO
  * vocabulary state — each token's portable hash picks a dimension
  * (`h mod dim`) and a sign (`(h div dim) mod 2 → ±1`, the collision
  * -bias-cancelling variant), and signed counts accumulate.
  *
  * Why this is the 100 TB featurizer: there is no fit step, no
  * dictionary to build or broadcast, no OOV handling — the transform
  * is pure map-side arithmetic on the token hash stream, then one
  * partial-aggregable groupBy. Counts stay exact integers end to end,
  * so the DuckDB oracle replays the whole pipeline (hash → dim/sign →
  * signed sums → integer dot products), and downstream cosine math on
  * the integer vectors is deterministic on any cluster size.
  */
object TextFeatures {

  /** Long-format hashed features: one row per (keep-columns ×
    * occupied dimension) with the exact signed count. `keep` may be
    * any grouping granularity — doc_id for per-document vectors, lang
    * for corpus-level class profiles (the groupBy collapses tokens
    * map-side either way). Dims whose signs cancel to 0 are kept:
    * "occupied" is a property of the token stream, not the value. */
  def hashedTermDims(docs: DataFrame, dim: Int, textCol: String = "text",
      keep: Seq[String] = Seq("doc_id")): DataFrame = {
    require(dim >= 2, "hashedTermDims needs dim >= 2")
    GraftFunctions.register(docs.sparkSession)
    val keepCols = keep.map(col)
    docs.select(keepCols :+
        explode(GraftFunctions.tokenHashes(split(col(textCol), " "))).as("h"): _*)
      .select(keepCols :+ (col("h") % dim).cast("int").as("dim") :+
        expr(s"((h div $dim) % 2) * 2 - 1").as("sign"): _*)
      .groupBy((keep :+ "dim").map(col): _*)
      .agg(sum(col("sign")).as("cnt"))
  }

  /** Dense `array<float>` assembly from the long format — the shape
    * the [[Similarity]] / [[KMeans]] operators consume, so hashed
    * features feed ANN search and clustering directly. */
  def denseVectors(dims: DataFrame, dim: Int, keep: Seq[String] = Seq("doc_id")): DataFrame =
    dims.groupBy(keep.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("dim"), col("cnt")))).as("m"))
      .withColumn("features", expr(
        s"transform(sequence(0, ${dim - 1}), d -> cast(coalesce(element_at(m, d), 0L) as float))"))
      .drop("m")
}
