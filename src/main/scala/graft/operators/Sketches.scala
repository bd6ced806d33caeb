package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.GraftFunctions

/** Distinct-cardinality sketches for corpus profiling at 100 TB:
  * KMV (k minimum values, Bar-Yossef et al. 2002) — keep the k
  * smallest distinct hash values of a column; the k-th smallest order
  * statistic estimates the full distinct count as `(k-1)·P / h_k`
  * (hashes uniform on [0, P)), with relative standard error
  * ≈ 1/√(k−2).
  *
  * Two families, both fully oracle-replayable:
  *
  *  - KMV: pure order statistics of the engine-portable hash, so the
  *    DuckDB oracle replays the ENTIRE computation (hashing, the min-k
  *    cut, the estimator arithmetic). Mergeable (union = k smallest of
  *    the merged min-sets — property-tested). Spark's own
  *    `approx_count_distinct` (HLL++) can only ever get a tolerance
  *    check because its register layout is engine-private; these
  *    sketches are built FROM relational primitives, so the hash gate
  *    covers them exactly.
  *  - HLL (Flajolet et al. 2007), hand-rolled on the same hash: a
  *    register is `max(rho)` per bucket — integer-exact (`rho` comes
  *    from the binary length of the hash remainder, no floating
  *    point), so registers replay as a plain GROUP BY. The register
  *    update being `max` means Spark's native partial aggregation IS
  *    the sketch merge: map-side combine builds per-partition sketches
  *    and the shuffle carries at most m registers per group. The
  *    estimator is bit-deterministic across engines by construction:
  *    the harmonic sum is a sum of exact powers of two (order-
  *    independent), `alpha·m²` is embedded as one double literal, and
  *    the linear-counting branch `floor(m·ln(m/V))` is a precomputed
  *    m-entry literal table — no libm call in either engine.
  *
  * KMV when the distinct count is small-to-moderate and you want the
  * min-set itself (overlap estimates via inclusion–exclusion); HLL
  * when groups are many and state must be O(m) fixed regardless of
  * cardinality.
  *
  * Scale shape: the distinct-hash reduction is a map-side-combinable
  * aggregation on thin longs — for heavy-duplication domains (tokens,
  * shingles: vocab ≪ corpus) the shuffle is O(distinct), not
  * O(corpus) — and the min-k cut is TakeOrderedAndProject (per-
  * partition top-k, no global sort). The sketch itself is k longs
  * (KMV) or m small ints (HLL).
  */
object Sketches {

  /** Hash space modulus — shared with every portable text hash. */
  val P: Long = TextDedup.P

  /** Portable char-fold hash of a single string column (the same
    * `(acc·31 + codepoint) mod P` family the oracles replay), via the
    * native kernel over a 1-element array. */
  def portableHash(c: Column): Column =
    element_at(GraftFunctions.tokenHashes(array(c)), 1)

  /** The KMV hash: char-fold, then a Knuth multiplicative scatter
    * `(h · 2654435761) mod P`. The raw fold is a fine identity
    * fingerprint, but on structured inputs (sequential ids) its
    * residues are not uniform enough for ORDER STATISTICS — the
    * estimator under-read 31% on 20k sequential keys; with the
    * scatter it reads within 2.3%. The product stays below 2^63
    * (h < P ≈ 1e9, multiplier < 2.7e9), so both engines evaluate the
    * identical exact integer expression. */
  def kmvHash(c: Column): Column =
    (portableHash(c) * lit(2654435761L)) % lit(P)

  /** The KMV sketch: k smallest DISTINCT scattered hashes of `c`
    * (fewer rows when the column has < k distinct values — the sketch
    * is exact below k). NULLs are excluded. */
  def kmvSketch(df: DataFrame, c: Column, k: Int): DataFrame = {
    require(k >= 2, "kmvSketch needs k >= 2")
    GraftFunctions.register(df.sparkSession)
    df.where(c.isNotNull).select(kmvHash(c).as("h"))
      .distinct()
      .orderBy(col("h").asc)
      .limit(k)
  }

  /** Merge two sketches built with the same k: the k smallest of the
    * union of their min-sets — exactly the sketch of the combined
    * input (property-tested). */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionAll(b).distinct().orderBy(col("h").asc).limit(k)

  /** Distinct-count estimate from a sketch: exact when the sketch is
    * under-full (m < k ⇒ the column had exactly m distinct hashes),
    * otherwise `(k-1)·P / h_k` floored. One row:
    * (k, m, kth_hash, n_est). */
  def estimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("m"), max(col("h")).as("kth_hash"))
      .select(
        lit(k).as("k"), col("m"), col("kth_hash"),
        when(col("m") < k, col("m"))
          .otherwise(floor(lit((k - 1).toDouble * P) / col("kth_hash").cast("double"))
            .cast("long"))
          .as("n_est"))

  /** [[kmvSketch]] + [[estimate]] in one call. */
  def kmvEstimate(df: DataFrame, c: Column, k: Int): DataFrame =
    estimate(kmvSketch(df, c, k), k)

  /** PER-GROUP KMV as a typed [[Aggregator]]: `groupBy(g).agg(
    * kmvAgg(k).toColumn)` builds every group's min-k set in ONE pass
    * with O(k) state per group — reduce inserts and trims, merge
    * unions and trims, both orders of magnitude under a per-group
    * distinct. This is the sketch's native form in a warehouse
    * (distinct users per day, distinct tokens per language) and works
    * unchanged in Structured Streaming aggregations. Input is the
    * ALREADY-HASHED value ([[kmvHash]]); output is the sorted min-k
    * array, ready for [[estimateFromMins]]. */
  def kmvAgg(k: Int): Aggregator[Long, Seq[Long], Seq[Long]] = {
    // fail fast at construction: k = 0 would otherwise surface as an
    // executor-side UnsupportedOperationException (Vector.empty.last)
    // on the first insert
    require(k >= 2, "kmvAgg needs k >= 2 (same contract as kmvSketch)")
    new Aggregator[Long, Seq[Long], Seq[Long]] {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      // buffer invariant: sorted ascending, distinct, size <= k
      override def zero: Seq[Long] = Vector.empty
      override def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)
      override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
        b.foldLeft(a)(insert)
      override def finish(r: Seq[Long]): Seq[Long] = r
      override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
      override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
      private def insert(b: Seq[Long], h: Long): Seq[Long] =
        if (b.contains(h) || (b.size >= k && h >= b.last)) b
        else {
          val merged = (b :+ h).sorted
          if (merged.size > k) merged.take(k) else merged
        }
    }
  }

  /** Estimator over a min-k ARRAY column (the [[kmvAgg]] output,
    * sorted ascending): exact below k, else `(k-1)·P / max`. Lets the
    * per-group form reuse the identical arithmetic the global
    * [[estimate]] uses. */
  def estimateFromMins(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * P) / element_at(mins, -1).cast("double"))
        .cast("long"))

  // ---------------------------------------------------------------- HLL

  /** Register width: rho values live in 1..W+1 where W = floor(log2(
    * P/m)) — the usable suffix bits of the mod-P hash after the bucket
    * index is taken. P ≈ 2^30, so W ≈ 30 − log2(m): cardinalities up
    * to ~2^W·m are in range (harness scales sit far below). */
  def hllW(m: Int): Int = {
    require(m >= 16 && m <= 65536 && (m & (m - 1)) == 0,
      "hll m must be a power of two in 16..65536")
    63 - java.lang.Long.numberOfLeadingZeros(P / m)
  }

  /** Bucket index of a value column: `h mod m` of the scattered
    * portable hash. */
  def hllBucket(c: Column, m: Int): Column =
    pmod(kmvHash(c), lit(m.toLong))

  /** rho of a value column: 1 + number of leading zeros of the hash
    * remainder within its W-bit window, computed INTEGER-EXACTLY as
    * `W + 1 − length(bin(v))` (bin = minimal binary string in both
    * Spark and DuckDB; v = 0 ⇒ W + 1). */
  def hllRho(c: Column, m: Int): Column = {
    val w = hllW(m)
    val v = pmod(floor(kmvHash(c) / lit(m)).cast("long"), lit(1L << w))
    when(v === 0, lit(w + 1)).otherwise(lit(w + 1) - length(bin(v)))
  }

  /** `alpha_m · m²` — the HLL bias constant premultiplied driver-side
    * so both engines see ONE double literal (no multiply-order
    * divergence). */
  def hllAlphaM2(m: Int): Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m
  }

  /** Linear-counting table: entry v (1-based) = floor(m·ln(m/v)) for
    * v = 1..m. Precomputed so NEITHER engine evaluates ln — libm
    * implementations differ in the last ulp, and a floor on top of
    * that is exactly the kind of boundary flip the hash gate exists to
    * catch. */
  def hllLinearTable(m: Int): IndexedSeq[Long] =
    (1 to m).map(v => math.floor(m * math.log(m.toDouble / v)).toLong)

  /** HLL estimate from the per-group aggregate pair
    * (`nPresent` = count of non-empty buckets, `zSum` = Σ 2^-reg over
    * them): raw harmonic-mean estimate with linear-counting fallback
    * when E ≤ 2.5m and empty buckets remain. Every arithmetic step is
    * bit-deterministic across engines (exact power-of-two sums, one
    * literal constant, table lookup). */
  def hllEstimate(nPresent: Column, zSum: Column, m: Int): Column = {
    val zeros = (lit(m) - nPresent).cast("int")
    val z = zeros.cast("double") + zSum
    val eRaw = lit(hllAlphaM2(m)) / z
    when(eRaw <= lit(2.5 * m) && zeros > 0,
      element_at(typedlit(hllLinearTable(m)), zeros))
      .otherwise(floor(eRaw).cast("long"))
  }

  /** Σ 2^-reg aggregate over a register column — exact double
    * arithmetic: each term is a power of two from an integer shift
    * (reg ≤ W+1 ≤ 63), so partial sums are exact multiples of 2^-(W+1)
    * and the result is order-independent. */
  def hllZSum(reg: Column): Column =
    sum(lit(1.0) / call_function("shiftleft", lit(1L), reg.cast("int")).cast("double"))

  /** One-shot global HLL distinct estimate of `c`: registers via one
    * map-side-combinable groupBy(bucket).max(rho), then the estimator.
    * One row: (m, n_present, n_est). Empty input estimates 0 (the
    * zsum coalesce routes it into the linear-counting branch, whose
    * table entry at V = m is floor(m·ln(1)) = 0). */
  def hllDistinct(df: DataFrame, c: Column, m: Int): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, c, m), m)

  /** The HLL register table (bucket, reg) of `c` — the sketch's
    * persistable STATE: ≤ m thin rows regardless of input size, and
    * sketch union is per-bucket MAX ([[hllMergeRegisters]] —
    * deterministic and exact, so registers built by separate runs
    * merge into exactly the single-shot registers of the combined
    * input). [[hllEstimateFromRegisters]] turns any register table
    * into the [[hllDistinct]] estimate. */
  def hllRegisters(df: DataFrame, c: Column, m: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.where(c.isNotNull)
      .select(hllBucket(c, m).as("bucket"), hllRho(c, m).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("reg"))
  }

  /** Union of two register tables built with the same m: per-bucket
    * MAX — exactly the registers of the combined input. */
  def hllMergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy(col("bucket")).agg(max(col("reg")).as("reg"))

  /** Estimator over a register table: (m, n_present, n_est) — the
    * [[hllDistinct]] tail, callable on loaded/merged state. */
  def hllEstimateFromRegisters(regs: DataFrame, m: Int): DataFrame =
    regs.agg(count(lit(1)).as("n_present"),
        coalesce(hllZSum(col("reg")), lit(0.0)).as("zsum"))
      .select(lit(m).as("m"), col("n_present"),
        hllEstimate(col("n_present"), col("zsum"), m).as("n_est"))

  /** PER-GROUP HLL distinct estimates — the sketch's native warehouse
    * form (distinct users per day, distinct tokens per language) built
    * from two relational aggregations: groupBy(g, bucket).max(rho)
    * (map-side combinable — partial aggregation IS the sketch merge,
    * so the shuffle carries ≤ m register rows per group), then the
    * per-group estimator. State per group is O(m) REGARDLESS of group
    * cardinality — the property that lets one pass profile a 100 TB
    * fact. Output: (g, n_present, n_est). */
  def hllDistinctBy(df: DataFrame, g: Column, c: Column, m: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.where(c.isNotNull)
      .select(g.as("g"), hllBucket(c, m).as("bucket"), hllRho(c, m).as("rho"))
      .groupBy(col("g"), col("bucket")).agg(max(col("rho")).as("reg"))
      .groupBy(col("g")).agg(count(lit(1)).as("n_present"),
        hllZSum(col("reg")).as("zsum"))
      .select(col("g"), col("n_present"),
        hllEstimate(col("n_present"), col("zsum"), m).as("n_est"))
  }

  // ---------------------------------------------------------------- CMS

  /** Count-Min Sketch counters (Cormode & Muthukrishnan 2005) over a
    * string column: `d` independent hash rows of `w` counters; an
    * item's frequency estimate is the MINIMUM of its d counters —
    * never an undercount, overcounts only from collisions
    * (E[over] ≤ e·N/w per row). Row hashes reuse the portable
    * permutation family ((2i+1)·h + 999983·i mod P, then mod w), so a
    * DuckDB oracle replays the whole sketch integer-exactly.
    *
    * Scale shape: the build is ONE map-side-combinable groupBy over
    * (row, position) — state is d·w integer cells regardless of input
    * size, and the shuffle carries at most d·w rows. This is the
    * frequency-sketch companion to KMV/HLL's cardinality sketches:
    * heavy-hitter screens over 100 TB token streams without a
    * full-vocabulary aggregation. Output: (row, pos, cnt), only
    * occupied cells. */
  def cmsCounters(df: DataFrame, c: Column, d: Int = 4, w: Int = 512): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 16, "cms needs 1 <= d <= 16, w >= 16")
    val th = portableHash(c)
    df.where(c.isNotNull)
      .select(posexplode(array((0 until d).map { i =>
        pmod(pmod(th * lit((2 * i + 1).toLong) + lit(999983L * i), lit(P)), lit(w.toLong))
      }: _*)).as(Seq("row", "pos")))
      .groupBy(col("row"), col("pos")).agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `queries`' `qc` values against a
    * counter table from [[cmsCounters]] (same d, w): min over the d
    * probed cells; values absent from the build estimate 0. */
  def cmsEstimate(counters: DataFrame, queries: DataFrame, qc: Column,
      d: Int = 4, w: Int = 512): DataFrame = {
    val th = portableHash(qc)
    queries
      .select(qc.as("q"), posexplode(array((0 until d).map { i =>
        pmod(pmod(th * lit((2 * i + 1).toLong) + lit(999983L * i), lit(P)), lit(w.toLong))
      }: _*)).as(Seq("row", "pos")))
      .join(broadcast(counters), Seq("row", "pos"), "left")
      .groupBy(col("q"))
      // an unoccupied cell IS a zero counter: coalesce BEFORE the min,
      // or a value absent from the build would read its colliding
      // cells' counts instead of 0
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** Join-cardinality estimate from two CMS counter tables over the
    * join key (Cormode & Muthukrishnan 2005 §4.2, the inner-product
    * estimator): |A ⋈ B| = Σ_k fA(k)·fB(k), estimated as the MINIMUM
    * over the d hash rows of the row-wise counter inner product.
    * Never an undercount (every true matching pair lands in the same
    * cell of every row); overcounts only from collisions,
    * E[over] ≤ N_A·N_B/w per row. The planner use: size a join from
    * two d·w-cell sketches — kilobytes of state per 100 TB input —
    * before choosing broadcast vs shuffle vs salting. */
  def cmsJoinSize(a: DataFrame, ca: Column, b: DataFrame, cb: Column,
      d: Int = 4, w: Int = 512): DataFrame = {
    val sa = cmsCounters(a, ca, d, w).withColumnRenamed("cnt", "ca")
    val sb = cmsCounters(b, cb, d, w).withColumnRenamed("cnt", "cb")
    sa.join(sb, Seq("row", "pos")) // a cell unoccupied on either side adds 0
      .groupBy(col("row"))
      .agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("min_ip"), count(lit(1)).as("n_rows"))
      // a hash row with NO co-occupied cells has inner product 0; the
      // inner join dropped it, so the min must be forced to see it
      .select(when(col("n_rows") < d, lit(0L)).otherwise(col("min_ip"))
        .as("join_size_est"))
  }

  /** Set-overlap estimate between two columns from their sketches
    * (inclusion–exclusion over KMV union): |A∪B| from the merged
    * sketch, |A∩B| = |A| + |B| − |A∪B|, clamped at 0. One row:
    * (n_a, n_b, n_union, n_intersect). The oracle replays all four
    * estimators; at warehouse scale the two input sketches would be
    * materialized per-corpus and only the k-long min-sets move. */
  def kmvOverlap(a: DataFrame, ca: Column, b: DataFrame, cb: Column, k: Int): DataFrame = {
    val sa = kmvSketch(a, ca, k)
    val sb = kmvSketch(b, cb, k)
    val ea = estimate(sa, k).select(col("n_est").as("n_a"))
    val eb = estimate(sb, k).select(col("n_est").as("n_b"))
    val eu = estimate(merge(sa, sb, k), k).select(col("n_est").as("n_union"))
    ea.crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
      .select(col("n_a"), col("n_b"), col("n_union"),
        greatest(col("n_a") + col("n_b") - col("n_union"), lit(0L)).as("n_intersect"))
  }
}
