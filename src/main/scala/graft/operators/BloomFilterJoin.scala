package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
      * the reduction result-invisible). NULL keys test NULL, and a
      * NULL predicate drops the row — safe for equi-joins, where NULL
      * never matches. */
    def mightContain(key: Column): Column =
      (0 until nHash).map { i =>
        val pos = pmod(xxhash64(lit(i), key), lit(mBits.toLong)).cast("int")
        // `/` is double division in Spark — floor+cast keeps the index integral
        val word = element_at(typedlit(words), floor(pos / 64).cast("int") + 1)
        word.bitwiseAND(call_function("shiftleft", lit(1L), pos % 64)) =!= lit(0L)
      }.reduce(_ && _)

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

  /** Inner equi-join of `large ⋈ small` on `largeKey = smallKey`, with
    * `large` pre-reduced by a Bloom filter over `small`'s keys. Row
    * multiset identical to the plain inner join (false positives are
    * removed by the join itself; false negatives cannot occur). */
  def reducedJoin(large: DataFrame, largeKey: String, small: DataFrame,
      smallKey: String, mBits: Int = 1 << 16, nHash: Int = 4): DataFrame = {
    val bloom = build(small, col(smallKey), mBits, nHash)
    large.where(bloom.mightContain(col(largeKey)))
      .join(small, col(largeKey) === col(smallKey))
  }
}
