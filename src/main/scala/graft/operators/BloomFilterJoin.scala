package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, NumericType, ShortType}

/** Bloom-filter semi-join reduction — the "runtime filter" pattern
  * (SURVEY.md §7.5 "minimize shuffles"; Snowflake and Spark both ship
  * it as an optimizer feature: SPARK-32268 / the
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` rule). This is
  * the explicit, composable form for when the optimizer can't inject
  * one (filter computed by an earlier job, probe side behind a
  * streaming source, or the build side produced by a non-join stage).
  *
  * Why it matters at 100 TB: an inner equi-join of a huge fact against
  * a SELECTIVE dimension subset shuffles the whole fact — including
  * every row whose key can't possibly match. A Bloom filter built from
  * the dim keys and applied AT THE FACT SCAN drops non-matching rows
  * before they enter the exchange, shrinking the shuffle by the join's
  * selectivity at the cost of one bounded bitset broadcast. False
  * positives are eliminated by the real join that follows, so the
  * result is bit-identical to the plain join — which is exactly what
  * the oracle gate checks (the DuckDB oracle runs the PLAIN join; any
  * lost or duplicated row flips the hash).
  *
  * Mechanics kept engine-honest:
  *  - hashes are `xxhash64(i, key)` — Spark's codegen'd 64-bit hash,
  *    double-hashed by prepending the function index (no custom UDF,
  *    no interpreted path). Portability to DuckDB is NOT needed: the
  *    filter is result-invisible, so the oracle never replays it.
  *  - the bitset is built with one distributed distinct over bit
  *    positions and collected as at most `mBits` integers — an O(m/8)
  *    PARAMETER fetch (like the k-means centroid fetch), not a data
  *    collect; the corpus itself never reaches the driver.
  *  - the probe is `element_at(<word literal array>, pos/64+1) &
  *    (1 << pos%64)` — builtin expressions end-to-end, so the filter
  *    stays inside WholeStageCodegen at the scan.
  */
object BloomFilterJoin {

  /** An immutable Bloom bitset: `mBits` bits in 64-bit words,
    * `nHash` double-hashed probes per key. */
  final case class BloomBits(words: IndexedSeq[Long], mBits: Int, nHash: Int) {

    /** True when `key` MAY be in the build set (never false for a key
      * that was inserted — the no-false-negative property is what makes
      * the reduction result-invisible). NULL keys return FALSE
      * explicitly: Spark's xxhash64 skips NULL children (the hash
      * accumulator is left unchanged, producing a REAL hash, not
      * NULL), so without the isNotNull guard a NULL key could pass the
      * probes — harmless inside an inner join but wrong for standalone
      * use as an anti-join prefilter. */
    def mightContain(key: Column): Column = {
      val positions = array((0 until nHash).map(i =>
        pmod(xxhash64(lit(i), key), lit(mBits.toLong)).cast("int")): _*)
      // One words literal + one codegen'd probe loop (graft_bloom_test)
      // instead of nHash chained element_at/shiftleft terms: the
      // per-probe form serialized nHash copies of the bitset into the
      // task binary — 104 MiB broadcasts at the 16 MiB sizing cap with
      // 7 probes, measured in the sf10 rehearsal.
      key.isNotNull && call_function("graft_bloom_test", positions, typedlit(words))
    }

    /** Fraction of set bits — the standard saturation diagnostic
      * (false-positive rate ≈ saturation^nHash). */
    def saturation: Double =
      words.map(java.lang.Long.bitCount).sum.toDouble / mBits
  }

  /** Build a Bloom bitset from the DISTINCT values of `key` in
    * `build` (NULLs excluded — NULL never equi-joins, so it has no
    * business occupying bits). Distributed: each row expands to its
    * `nHash` positions map-side; the shuffle carries distinct
    * positions only (≤ `mBits` ints); the driver materializes just the
    * bitset. */
  def build(builds: DataFrame, key: Column, mBits: Int = 1 << 16,
      nHash: Int = 4): BloomBits = {
    // the probe side needs the graft_bloom_test kernel; register here
    // so sessions built without the extensions config still resolve it
    graft.GraftFunctions.register(builds.sparkSession)
    require(mBits > 0 && mBits <= (1 << 27), "mBits must be in 1..2^27 (16 MiB)")
    require(nHash > 0 && nHash <= 16, "nHash must be in 1..16")
    val posCols = (0 until nHash).map(i =>
      pmod(xxhash64(lit(i), key), lit(mBits.toLong)).cast("int"))
    val positions = builds.where(key.isNotNull)
      .select(explode(array(posCols: _*)).as("p"))
      .distinct()
      .collect().map(_.getInt(0))
    val words = new Array[Long]((mBits + 63) / 64)
    positions.foreach(p => words(p / 64) |= (1L << (p % 64)))
    BloomBits(words.toIndexedSeq, mBits, nHash)
  }

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.operators.BloomFilterJoin")

  /** Standard Bloom sizing for `nDistinct` keys at `targetFpp`:
    * m = ⌈−n·ln(p)/ln²2⌉ bits (clamped to [1024, 2^27]),
    * k = round(m/n·ln2) probes (clamped to [1, 16]). At the default 1%
    * target that is ~9.6 bits and 7 probes per distinct key. */
  def sizeFor(nDistinct: Long, targetFpp: Double = 0.01): (Int, Int) = {
    require(targetFpp > 0 && targetFpp < 1, "targetFpp must be in (0, 1)")
    val n = math.max(nDistinct, 1L)
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-n.toDouble * math.log(targetFpp) / (ln2 * ln2)).toLong
    val m = math.min(math.max(mRaw, 1024L), 1L << 27).toInt
    val k = math.max(1, math.min(16, math.round(m.toDouble / n.toDouble * ln2).toInt))
    (m, k)
  }

  /** [[build]] with mBits/nHash derived from the build side's APPROX
    * distinct key count (HLL++, one cheap aggregate — the sizing only
    * tunes the false-positive rate, so an approximate count is exactly
    * right; correctness never depends on it). */
  def buildAuto(builds: DataFrame, key: Column, targetFpp: Double = 0.01): BloomBits = {
    val n = builds.where(key.isNotNull)
      .agg(approx_count_distinct(key).as("n")).head().getLong(0)
    // 25% headroom: the textbook optimum sets EXACTLY half the bits
    // (saturation 0.5), and the HLL++ count carries a few percent of
    // error — headroom keeps realized saturation ~0.43 and the fpp
    // at-or-below target even when the estimate reads low
    val (m, k) = sizeFor(math.ceil(n * 1.25).toLong, targetFpp)
    log.info(s"bloom auto-size: ~$n distinct keys -> mBits=$m nHash=$k (target fpp $targetFpp)")
    build(builds, key, m, k)
  }

  /** Sentinel for [[reducedJoin]]'s `mBits`: size the bitset from the
    * build side's distinct count (targeting ~1% false positives). */
  val Auto: Int = 0

  /** The hash-input type both join keys are cast to before probing:
    * Spark's xxhash64 is TYPE-SENSITIVE (xxhash64(1: int) !=
    * xxhash64(1L)), so mixed-type keys that the join would match after
    * implicit coercion MUST hash identically on both sides or the
    * filter silently drops matching rows (false negatives). Same-type
    * keys pass through; integral pairs widen to long, numeric pairs to
    * double (the join's own comparison coercion); anything else is
    * rejected rather than risk a semantic mismatch. */
  private val integralTypes: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)

  private[operators] def commonKeyType(a: DataType, b: DataType): DataType = (a, b) match {
    case _ if a == b => a
    case _ if integralTypes(a) && integralTypes(b) => LongType
    case (_: NumericType, _: NumericType) => DoubleType
    case _ => throw new IllegalArgumentException(
      s"bloom join keys must share a type family (got $a vs $b) — cast explicitly")
  }

  /** Inner equi-join of `large ⋈ small` on `largeKey = smallKey`, with
    * `large` pre-reduced by a Bloom filter over `small`'s keys. Row
    * multiset identical to the plain inner join (false positives are
    * removed by the join itself; false negatives cannot occur — both
    * keys hash through the SAME coerced type, see [[commonKeyType]]).
    * `mBits = Auto` (the default) sizes the bitset from the build
    * side's approx distinct count at ~1% FPR; the realized saturation
    * is logged as the standard health diagnostic
    * (fpp ≈ saturation^nHash). */
  def reducedJoin(large: DataFrame, largeKey: String, small: DataFrame,
      smallKey: String, mBits: Int = Auto, nHash: Int = 4): DataFrame = {
    val common = commonKeyType(large.schema(largeKey).dataType, small.schema(smallKey).dataType)
    val bloom =
      if (mBits == Auto) buildAuto(small, col(smallKey).cast(common))
      else build(small, col(smallKey).cast(common), mBits, nHash)
    log.info(f"bloom reducedJoin($largeKey = $smallKey): mBits=${bloom.mBits} " +
      f"nHash=${bloom.nHash} saturation=${bloom.saturation}%.4f")
    large.where(bloom.mightContain(col(largeKey).cast(common)))
      .join(small, col(largeKey) === col(smallKey))
  }
}
