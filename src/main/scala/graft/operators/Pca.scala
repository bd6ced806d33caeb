package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Top principal component of an embedding corpus by power iteration,
  * and the "all-but-the-top" correction built on it (Mu & Viswanath
  * 2018, "All-but-the-Top: Simple and Effective Postprocessing for
  * Word Representations" — embedding corpora concentrate mass on a
  * dominant direction; removing it sharpens cosine geometry, a
  * standard postprocess before near-dup / ANN over text embeddings).
  *
  * Replayability contract (the [[Classifier]] / [[KMeans]] policy —
  * every engine-dependent libm call is banned from training):
  *
  *  1. ONE distributed pass accumulates exact integer moments over
  *     micro-quantized components (floor(x·1e6 + 0.5) — the
  *     [[graft.operators.Cartography]] grid): N, per-dim sums Sᵢ, and
  *     upper-triangle second moments Mᵢⱼ, all partial-aggregable
  *     decimal sums. Shuffle volume is d + d(d+1)/2 keys — O(1) in
  *     corpus size.
  *  2. The scatter matrix Gᵢⱼ = N·Mᵢⱼ − Sᵢ·Sⱼ (exact BigInt; = N²×
  *     covariance in micro² units) is normalized by TRUNCATING
  *     division G ÷ N² — both engines truncate toward zero — which
  *     bounds every entry by ~d·Micro² < 2⁵³, so the int→double cast
  *     is EXACT on both engines at any corpus size.
  *  3. Power iteration runs on the driver over that d×d double matrix
  *     (a bounded parameter, like k-means centroids): y = Ĝv in
  *     ascending-j fold order, v ← y/‖y‖ with ‖y‖ from an ascending-i
  *     fold — +,×,÷,sqrt only, each IEEE-exact, so the oracle's
  *     list_reduce chains reproduce every bit.
  *
  * The fixed iteration count (no convergence test) keeps the replay
  * finite — the fixed-rounds policy of [[HistQuantiles]]' GLOBAL
  * forms.
  */
object Pca {

  /** Quantization grid (1e-6, micro units). */
  val Micro = 1e6

  /** Exact integer moments of a quantized embedding corpus:
    * `n` vectors, `s(i)` = Σ qᵢ, `m((i,j))` = Σ qᵢ·qⱼ for 1 ≤ i ≤ j ≤ d
    * (1-based, upper triangle). */
  final case class Moments(n: Long, s: Array[BigInt], m: Map[(Int, Int), BigInt])

  /** One-pass exact moment accumulation. Rows with NULL embeddings or
    * length ≠ d are excluded (a PCA over mixed dimensionalities is
    * undefined). Linear terms ride the same aggregate as the pair
    * terms under sentinel key i = 0, so the corpus is scanned ONCE. */
  def moments(emb: DataFrame, d: Int, embCol: String = "embedding"): Moments = {
    val q = emb.filter(col(embCol).isNotNull && size(col(embCol)) === d)
      .select(transform(col(embCol),
        x => floor(x.cast("double") * lit(Micro) + lit(0.5)).cast("long")).as("q"))
    val lin = q.select(posexplode(col("q")).as(Seq("i0", "v")))
      .select(lit(0).as("i"), (col("i0") + 1).as("j"),
        col("v").cast("decimal(38,0)").as("term"))
    val pairs = q.select(col("q"), posexplode(col("q")).as(Seq("i0", "vi")))
      .select((col("i0") + 1).as("i"), col("vi"),
        posexplode(col("q")).as(Seq("j0", "vj")))
      .filter(col("j0") + 1 >= col("i"))
      .select(col("i"), (col("j0") + 1).as("j"),
        (col("vi").cast("decimal(19,0)") * col("vj").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("term"))
    val agg = lin.unionByName(pairs)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("term")).as("t"), count(lit(1)).as("c"))
      .collect()
    if (agg.isEmpty) return Moments(0L, Array.fill(d)(BigInt(0)), Map.empty)
    val s = Array.fill(d)(BigInt(0))
    val m = Map.newBuilder[(Int, Int), BigInt]
    var n = 0L
    agg.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val t = BigInt(r.getDecimal(2).toBigInteger)
      if (i == 0) { s(j - 1) = t; n = r.getLong(3) }
      else m += ((i, j) -> t)
    }
    Moments(n, s, m.result())
  }

  /** Ĝ = (N·M − S·Sᵀ) ÷ N² (exact integers, truncating division,
    * symmetric fill) as exactly-castable doubles. Zero matrix for an
    * empty corpus. */
  private[graft] def normalizedScatter(mom: Moments, d: Int): Array[Array[Double]] = {
    if (mom.n == 0) return Array.fill(d, d)(0.0)
    val n2 = BigInt(mom.n) * BigInt(mom.n)
    Array.tabulate(d, d) { (a, b) =>
      val (i, j) = (math.min(a, b) + 1, math.max(a, b) + 1)
      ((BigInt(mom.n) * mom.m((i, j)) - mom.s(i - 1) * mom.s(j - 1)) / n2).toDouble
    }
  }

  /** `rounds` fixed power-iteration steps from the all-ones vector.
    * Every fold ascends the index, matching the oracle's list_reduce
    * chains term for term. A zero norm (constant corpus) yields the
    * zero vector and stays there — same CASE both engines. */
  private[graft] def powerIterate(g: Array[Array[Double]], d: Int, rounds: Int): Array[Double] = {
    var v = Array.fill(d)(1.0)
    var r = 0
    while (r < rounds) {
      val y = Array.tabulate(d) { i =>
        var acc = 0.0; var j = 0
        while (j < d) { acc += g(i)(j) * v(j); j += 1 }
        acc
      }
      var n2 = 0.0; var i = 0
      while (i < d) { n2 += y(i) * y(i); i += 1 }
      val nrm = math.sqrt(n2)
      v = if (nrm > 0) y.map(_ / nrm) else Array.fill(d)(0.0)
      r += 1
    }
    v
  }

  /** Train: one distributed moment pass, then the driver iteration.
    * Returns (moments, unit top-component u). */
  def fit(emb: DataFrame, d: Int, rounds: Int): (Moments, Array[Double]) = {
    require(d >= 1 && d <= 4096, "d must be in [1, 4096]")
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")
    val mom = moments(emb, d)
    (mom, powerIterate(normalizedScatter(mom, d), d, rounds))
  }

  /** All-but-the-top application pass, rolled up per label: for each
    * vector, centered micro components cdⱼ = (qⱼ·N − Sⱼ)/N (exact
    * int64 numerator, one IEEE divide), projection p = ⟨cd, u⟩ and
    * residual share 1 − p²/‖cd‖² via the [[graft.functions.DotProduct]]
    * kernel (ascending fold — the oracle replays it with dkDot), both
    * micro-quantized per row BEFORE the order-independent integer
    * sums. Output: (label, n_vecs, mean_abs_proj_micro,
    * mean_resid_share_micro), one row per label. Map-side only until
    * the final |labels|-row aggregate — one pass at any scale. */
  def abttLabelStats(emb: DataFrame, d: Int, mom: Moments, u: Array[Double],
      embCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    require(u.length == d && mom.s.length == d, "u/moments must match d")
    val n = math.max(mom.n, 1L) // n = 0 → input below is empty anyway
    val sArr = array(mom.s.map(x => lit(x.toLong)): _*)
    val uArr = array(u.map(lit(_)): _*)
    val q = emb.filter(col(embCol).isNotNull && size(col(embCol)) === d)
      .select(col(labelCol).as("label"),
        transform(col(embCol),
          x => floor(x.cast("double") * lit(Micro) + lit(0.5)).cast("long")).as("q"))
    val cd = zip_with(col("q"), sArr,
      (v, sj) => (v * lit(n) - sj).cast("double") / lit(n.toDouble))
    val scored = q.select(col("label"), cd.as("cd"))
      .select(col("label"),
        GraftFunctions.dot(col("cd"), uArr).as("p"),
        GraftFunctions.dot(col("cd"), col("cd")).as("cn2"))
      .select(col("label"),
        floor(abs(col("p")) * lit(Micro) + lit(0.5)).cast("long").as("pm"),
        floor(when(col("cn2") > 0, lit(1.0) - col("p") * col("p") / col("cn2"))
          .otherwise(lit(0.0)) * lit(Micro) + lit(0.5)).cast("long").as("rsm"))
    scored.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        floor(sum(col("pm")).cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("mean_abs_proj_micro"),
        floor(sum(col("rsm")).cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("mean_resid_share_micro"))
      .orderBy(col("label").asc)
  }
}
