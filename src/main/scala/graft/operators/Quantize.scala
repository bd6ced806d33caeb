package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftFunctions

/** Int8 (symmetric, per-vector) embedding quantization and quantized
  * similarity search — the memory/bandwidth lever for ANN at 100 TB:
  * a float32 corpus shrinks 4× (with its shuffle, cache, and scan
  * costs), while cosine ranking degrades only marginally.
  *
  * Not part of the reference's surface — a SURVEY.md §7.4 north-star
  * extension over the `embeddings` table.
  *
  * Quantization is the fused native kernel
  * [[graft.functions.Q8Quantize]] (`graft_q8`): `scale = 127/max|v|`,
  * `q_i = floor(v_i·scale + 0.5)` ∈ [-127, 127], one pass per row.
  * The chained-HOF spelling would re-inline the max-abs fold into the
  * quantize lambda (per-element re-evaluation — the repo's documented
  * interpreted-lambda gotcha), which is why this is a kernel and not
  * two `withColumn`s. `q8` is carried as array<int> (Spark/Parquet
  * have no int8 array element); a production deployment packs it to
  * binary, changing storage, not semantics.
  *
  * Scoring: cosine over the quantized vectors. Integer dot products
  * (|dot| ≤ 127²·dim ≪ 2⁵³) are EXACT in double, so the codegen
  * [[graft.functions.DotProduct]] kernel computes them with no
  * FP-order caveats — the DuckDB oracle's integer fold produces
  * bit-identical values. `qscale` cancels out of cosine; it is kept
  * for dequantized-dot consumers.
  */
object Quantize {

  /** Adds `q8` (array<int>, values in [-127, 127]) and `qscale` (the
    * float→int multiplier; 0 for all-zero vectors, which quantize to
    * all zeros). Vectors with any NULL element quantize to NULL. */
  def quantizeVectors(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.withColumn("_q", GraftFunctions.q8(col(vecCol)))
      .withColumn("q8", col("_q.q8"))
      .withColumn("qscale", col("_q.qscale"))
      .drop("_q")
  }

  /** Exact top-k by QUANTIZED cosine: same contract as
    * [[Similarity.bruteForceTopK]] (broadcast queries, corpus never
    * shuffles, per-query window for the k cut) but scoring int8
    * vectors. Output: (query_id, rank, neighbor_id, qcos). */
  def q8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0, "q8TopK needs k > 0")
    GraftFunctions.register(corpus.sparkSession)
    def prep(df: DataFrame, id: String, q8: String, nrm: String): DataFrame =
      quantizeVectors(df, vecCol).select(
        col(idCol).as(id), col("q8").as(q8),
        sqrt(GraftFunctions.dot(col("q8"), col("q8"))).as(nrm))
    val q = prep(queries, "query_id", "q_q8", "q_norm")
    val c = prep(corpus, "neighbor_id", "c_q8", "c_norm")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      // zero-norm (all-zero) vectors get qcos 0, not NULL/NaN
      .withColumn("qcos",
        when(col("q_norm") > 0.0 && col("c_norm") > 0.0,
          floor(GraftFunctions.dot(col("q_q8"), col("c_q8"))
            / (col("q_norm") * col("c_norm")) * 1e6 + 0.5) / 1e6)
          .otherwise(lit(0.0)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("qcos"))
  }
}
