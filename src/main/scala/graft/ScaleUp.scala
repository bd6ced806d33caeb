package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: synthesizes sf(0.1 × copies) from
  * the sf0.1 harness tables, preserving the properties the catalog's
  * cost profile actually depends on, so the bench can be rehearsed one
  * decade up (`BENCH_sf1.json`) without driver-side sfN data.
  *
  * Scaling rules (TPC-H discipline — facts scale, dims hold):
  *
  *  - region/nation copy unchanged.
  *  - Every key column shifts by `copy × (max_key + 1)` — key
  *    cardinalities scale 10× and referential integrity holds exactly
  *    (orders ⋈ customer, lineitem ⋈ part/supplier, events.user_id),
  *    so join fan-outs and per-key group sizes stay at their sf0.1
  *    shapes instead of multiplying.
  *  - customer names get a 2-substitution copy prefix: cross-copy
  *    edit distance ≥ 2, so the deletion-neighborhood linkage's
  *    candidate-pair volume scales linearly (10 verbatim copies of
  *    every name would grow it quadratically — an artifact real
  *    sf1 data does not have).
  *  - document texts in copies > 0 remap every token with a
  *    copy-specific suffix: length/vocabulary/duplication-rate per
  *    copy match sf0.1 (the planted within-copy duplicates survive
  *    verbatim), while cross-copy shingle overlap drops to zero —
  *    near-dup candidate generation scales like a real 10× corpus.
  *  - embeddings in copies > 0 circular-shift coordinates by a
  *    copy-specific lag: norms and coordinate distributions are
  *    untouched, cross-copy cosine collapses to noise-level
  *    autocorrelation — LSH/IVF bucket occupancies scale linearly.
  *
  * This data feeds the PERF rehearsal only (Bench), never the
  * correctness gate: oracles keep running against the driver's own
  * testdata.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "bench-data/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.build("graft-scaleup")
    scale(spark, src, dst, copies)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    require(copies >= 1 && copies <= 100, "copies in [1, 100]")

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    /** Union `copies` shifted replicas; `mutate(copyIdx)` returns the
      * per-copy column overrides. */
    def replicate(df: DataFrame, mutate: Int => Seq[(String, org.apache.spark.sql.Column)]): DataFrame =
      (0 until copies).map { c =>
        mutate(c).foldLeft(df) { case (d, (name, expr)) => d.withColumn(name, expr) }
      }.reduce(_ unionAll _)

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$name.parquet")

    val cust = Tables.customer(spark, src)
    val ord = Tables.orders(spark, src)
    val li = Tables.lineitem(spark, src)
    val part_ = Tables.part(spark, src)
    val supp = Tables.supplier(spark, src)
    val ev = Tables.events(spark, src)
    val docs = Tables.documents(spark, src)
    val emb = Tables.embeddings(spark, src)

    val cStr = stride(cust, "c_custkey")
    val oStr = stride(ord, "o_orderkey")
    val pStr = stride(part_, "p_partkey")
    val sStr = stride(supp, "s_suppkey")
    val eStr = stride(ev, "event_id")
    val uStr = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
    val dStr = stride(docs, "doc_id")
    val vStr = stride(emb, "vec_id")

    write(Tables.region(spark, src), "region", 1)
    write(Tables.nation(spark, src), "nation", 1)

    write(replicate(cust, c => Seq(
      "c_custkey" -> (col("c_custkey") + lit(c * cStr)),
      // 2-substitution prefix keeps cross-copy edit distance >= 2
      "c_name" -> (if (c == 0) col("c_name")
        else concat(lit(s"x${c % 10}y${c % 10}"), col("c_name"))))),
      "customer", 4)

    write(replicate(supp, c => Seq(
      "s_suppkey" -> (col("s_suppkey") + lit(c * sStr)))), "supplier", 2)

    write(replicate(part_, c => Seq(
      "p_partkey" -> (col("p_partkey") + lit(c * pStr)))), "part", 4)

    write(replicate(ord, c => Seq(
      "o_orderkey" -> (col("o_orderkey") + lit(c * oStr)),
      "o_custkey" -> (col("o_custkey") + lit(c * cStr)))), "orders", 8)

    write(replicate(li, c => Seq(
      "l_orderkey" -> (col("l_orderkey") + lit(c * oStr)),
      "l_partkey" -> (col("l_partkey") + lit(c * pStr)),
      "l_suppkey" -> (col("l_suppkey") + lit(c * sStr)))), "lineitem", 16)

    write(replicate(ev, c => Seq(
      "event_id" -> (col("event_id") + lit(c * eStr)),
      "user_id" -> (col("user_id") + lit(c * uStr)))), "events", 8)

    write(replicate(docs, c => Seq(
      "doc_id" -> (col("doc_id") + lit(c * dStr)),
      "text" -> (if (c == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"z$c"))), " ")),
      "n_chars" -> (if (c == 0) col("n_chars")
        else length(array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"z$c"))), " ")).cast("long")))),
      "documents", 8)

    write(replicate(emb, c => Seq(
      "vec_id" -> (col("vec_id") + lit(c * vStr)),
      // circular shift by a copy-specific lag: same norms, noise-level
      // cross-copy cosine
      "embedding" -> (if (c == 0) col("embedding")
        else {
          val lag = (c * 7) % 64 match { case 0 => 5; case k => k }
          concat(slice(col("embedding"), lag + 1, 64 - lag),
            slice(col("embedding"), 1, lag)).cast("array<float>")
        }))), "embeddings", 2)
  }
}
