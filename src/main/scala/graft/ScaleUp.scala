package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: synthesizes sf(0.1 × copies) from
  * the sf0.1 harness tables, preserving the properties the catalog's
  * cost profile actually depends on, so the bench can be rehearsed one
  * decade up (`BENCH_sf1.json`, copies = 10) or two (`BENCH_sf10.json`,
  * copies = 100) without driver-side sfN data. Every mutation rule is
  * collision-free across the full [0, 100) copy range — no pair of
  * copies shares a name prefix, token suffix, or embedding transform.
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

  /** Hard cap on `copies`: the embedding family below yields
    * 63 lags × 16 sign masks = 1008 pairwise-distinct transforms, one
    * decade past the sf10 rehearsal (the sf100 probe uses 1000). */
  val MaxCopies = 1008

  /** Name prefix for copy `c`: doubled-digit form over three digit
    * positions — any two distinct copies differ in at least one digit,
    * and each digit appears twice, so cross-copy edit distance stays
    * >= 2 for every pair up to copies = 1000 (a `c % 10` prefix
    * collides at c ≡ c' mod 10, which would inflate fuzzy-linkage
    * pair volume quadratically at sf10). ScaleUpSpec asserts the
    * pairwise distance over the full range. */
  def namePrefix(c: Int): String =
    if (c == 0) ""
    else {
      val u = c % 10; val t = (c / 10) % 10; val h = c / 100
      s"x$u${u}y$t${t}z$h$h"
    }

  /** Embedding transform for copy `c`: circular shift by a
    * copy-specific lag composed with a Walsh–Hadamard sign mask
    * (same norms, noise-level cross-copy cosine). The family is
    * lag = ((c−1) % 63) + 1 ∈ [1, 63] × mask v = (c−1) / 63 ∈ [0, 16):
    * coordinate i is negated iff popcount(i & v) is odd. Masks are
    * pairwise distinct, and for any two masks v ≠ w the disagreement
    * set is mask (v XOR w) — exactly 32 of the 64 coordinates — so two
    * copies sharing a lag still flip signs on exactly half the
    * coordinates (their cosine is a balanced ± sum of squares, not a
    * structural match). No two copies in [0, 1008) share a transform.
    * ScaleUpSpec asserts distinctness, the balanced-mask property, and
    * probe-vector decorrelation. */
  def embedMutation(c: Int, e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    if (c == 0) e
    else {
      val lag = ((c - 1) % 63) + 1
      val v = (c - 1) / 63
      val rotated = concat(slice(e, lag + 1, 64 - lag), slice(e, 1, lag))
      val signed =
        if (v == 0) rotated
        else {
          val flip = (0 until 64).map(i => java.lang.Integer.bitCount(i & v) % 2 == 1)
          zip_with(rotated, array(flip.map(lit): _*),
            (x, neg) => when(neg, -x).otherwise(x))
        }
      signed.cast("array<float>")
    }

  /** Local mirror of [[embedMutation]] for spec-side exhaustive
    * pairwise checks (a per-copy DataFrame probe is 1000 tiny jobs;
    * the mirror makes the 500k-pair sweep instant — ScaleUpSpec pins
    * mirror ≡ Column on sampled copies). */
  def embedMutationLocal(c: Int, e: Array[Float]): Array[Float] =
    if (c == 0) e
    else {
      val lag = ((c - 1) % 63) + 1
      val v = (c - 1) / 63
      val rotated = Array.tabulate(64)(i => e((i + lag) % 64))
      if (v == 0) rotated
      else Array.tabulate(64)(i =>
        if (java.lang.Integer.bitCount(i & v) % 2 == 1) -rotated(i) else rotated(i))
    }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "bench-data/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.build("graft-scaleup")
    scale(spark, src, dst, copies)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    require(copies >= 1 && copies <= MaxCopies, s"copies in [1, $MaxCopies]")

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    /** Union `copies` shifted replicas; `mutate(copyIdx)` returns the
      * per-copy column overrides. Balanced union tree (depth log₂ n):
      * a left-deep `reduce(_ unionAll _)` at copies = 1000 builds a
      * 1000-deep plan whose recursive TreeNode traversals risk the
      * driver stack; CombineUnions flattens either shape, but only
      * after analysis has already walked it. */
    def replicate(df: DataFrame, mutate: Int => Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
      def union(dfs: IndexedSeq[DataFrame]): DataFrame =
        if (dfs.size == 1) dfs.head
        else {
          val (l, r) = dfs.splitAt(dfs.size / 2)
          union(l) unionAll union(r)
        }
      union((0 until copies).map { c =>
        mutate(c).foldLeft(df) { case (d, (name, expr)) => d.withColumn(name, expr) }
      })
    }

    // Partition counts below are tuned for copies = 10; hold per-file
    // size roughly constant as copies grows another decade.
    val pScale = math.max(1, copies / 10)
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts * pScale).write.mode("overwrite").parquet(s"$dst/$name.parquet")

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
      "c_name" -> (if (c == 0) col("c_name")
        else concat(lit(namePrefix(c)), col("c_name"))))),
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
      "embedding" -> embedMutation(c, col("embedding")))), "embeddings", 2)
  }

  /** 64 → 64·factor-dim widening for PRODUCTION-DIMENSION rehearsal
    * (r10 verdict missing #4: fixtures are 64-dim, production
    * embeddings are 768–1536-dim — ADC table sizes and scan arithmetic
    * differ materially). Output block j is an ORTHOGONAL transform of
    * the base vector — circular shift by 17j mod 64 composed with the
    * Walsh sign mask j — and every block is scaled by 1/√factor
    * (exact in float for factor 4 / 16, so norms are preserved
    * bit-exactly). Orthogonal blocks preserve inner products:
    * ⟨W(u), W(v)⟩ = (1/f)·Σⱼ ⟨Tⱼu, Tⱼv⟩ = ⟨u, v⟩ — the widened corpus
    * carries the IDENTICAL neighbor structure at production
    * dimensionality, so recall probes measure the codec geometry, not
    * a new random dataset. Per-block (lag, mask) pairs are pairwise
    * distinct (lags 17j mod 64 distinct for j < 16 since gcd(17,64)=1;
    * masks j distinct) — ScaleUpSpec pins norms, inner products, and
    * the mirror. */
  def widenEmbedding(factor: Int, e: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    require(factor == 4 || factor == 16, "factor must be 4 or 16 (exact 1/sqrt(f) float scale)")
    val scale = (1.0 / math.sqrt(factor.toDouble)).toFloat // 0.5f / 0.25f, exact
    val blocks = (0 until factor).map { j =>
      val lag = (17 * j) % 64
      val rotated = if (lag == 0) e
        else concat(slice(e, lag + 1, 64 - lag), slice(e, 1, lag))
      if (j == 0) rotated
      else {
        val flip = (0 until 64).map(i => java.lang.Integer.bitCount(i & j) % 2 == 1)
        zip_with(rotated, array(flip.map(lit): _*),
          (x, neg) => when(neg, -x).otherwise(x))
      }
    }
    transform(concat(blocks: _*), x => x * lit(scale)).cast("array<float>")
  }

  /** Local mirror of [[widenEmbedding]] (the embedMutationLocal
    * pattern) for spec-side exact checks. */
  def widenEmbeddingLocal(factor: Int, e: Array[Float]): Array[Float] = {
    val scale = (1.0 / math.sqrt(factor.toDouble)).toFloat
    (0 until factor).flatMap { j =>
      val lag = (17 * j) % 64
      val rot = Array.tabulate(64)(i => e((i + lag) % 64))
      val sgn = if (j == 0) rot
        else Array.tabulate(64)(i =>
          if (java.lang.Integer.bitCount(i & j) % 2 == 1) -rot(i) else rot(i))
      sgn.map(_ * scale)
    }.toArray
  }
}



/** Writes a production-dimension embeddings rehearsal dir: `dst`
  * gets the widened embeddings (64·factor dims, identical neighbor
  * structure — [[ScaleUp.widenEmbedding]]) plus a verbatim lineitem
  * copy (Bench's warmup touches it). Recall probes then run the
  * dimension-generic PQ/IVFADC entries against `dst` directly:
  * `sbt "runMain graft.WidenEmbeddings <src> <dst> <factor>"`. */
object WidenEmbeddings {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "bench-data/sf0.1-d256"
    val factor = if (args.length > 2) args(2).toInt else 4
    val spark = Sessions.build("graft-widen")
    Tables.embeddings(spark, src)
      .withColumn("embedding", ScaleUp.widenEmbedding(factor, col("embedding")))
      .repartition(2).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    Tables.lineitem(spark, src).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    spark.stop()
  }
}
