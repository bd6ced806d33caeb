package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift gate: Population Stability Index between two
  * slices of one numeric column — the standard production check that
  * a feature's distribution hasn't shifted between a baseline window
  * and a current window (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
  * broken, per the common credit-scoring rule of thumb).
  *
  * PSI = Σ_buckets (p_a − p_b) · ln(p_a / p_b). This implementation
  * reports it in BITS (log2 instead of ln — multiply by ln 2 ≈ 0.693
  * for the classic scale) because log2 is what the engine can compute
  * portably: the same octave-ladder/chord approximation as
  * [[LanguageModel.surprisalBits]], so the oracle replays the value
  * bit-for-bit instead of trusting two libm `ln`s to agree.
  *
  * Design for exact replay AND bounded state:
  *  - ONE shared fixed grid over the union of both slices (same
  *    bucket expression and association order as [[HistQuantiles]]) —
  *    per-slice grids would make PSI incomparable;
  *  - Laplace-smoothed probabilities p = (c + 1) / (n + B): empty
  *    buckets stay in (0, 1] without an epsilon constant, and the
  *    arithmetic is integer-derived, so both engines divide identical
  *    values;
  *  - per-bucket contributions quantized to integer micro-bits before
  *    summing — the cross-bucket sum is order-independent (the
  *    Cols.sumExact policy), so partial aggregation cannot flap the
  *    gate;
  *  - a bucket SPINE (0..B−1) is generated and left-joined so buckets
  *    empty on BOTH sides still contribute their (tiny, nonzero when
  *    n_a ≠ n_b) smoothed term — identically on both engines.
  *
  * Scale shape: one pass computes (lo, hi, n_a, n_b) — O(1) state;
  * one pass buckets and counts — O(B) state, map-side combinable;
  * everything after runs on ≤ B rows against a broadcast 1-row stats
  * frame. Nothing holds per-value state.
  */
object Drift {

  /** Per-bucket PSI decomposition of `value` between the `sideA` rows
    * and the rest: (bucket, c_a, c_b, psi_microbits). Rows with NULL
    * `value` or NULL `sideA` are excluded. Output has exactly
    * `nBuckets` rows. */
  def psiBuckets(df: DataFrame, value: Column, sideA: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 16), "nBuckets must be in [2, 2^16]")
    val vals = df.filter(value.isNotNull && sideA.isNotNull)
      .select(value.cast("double").as("x"), sideA.cast("boolean").as("is_a"))
    // coalesce: sum over an EMPTY slice is NULL, and a null n would
    // null the smoothed probabilities all the way to the total
    val stats = vals.agg(
      min(col("x")).as("lo"), max(col("x")).as("hi"),
      coalesce(sum(when(col("is_a"), 1L).otherwise(0L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("is_a"), 0L).otherwise(1L)), lit(0L)).as("n_b"))
    // bucket: identical expression + association order to the
    // HistQuantiles grid (and its DuckDB mirror)
    val b = when(col("hi") === col("lo"), lit(0L)).otherwise(
      least(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * lit(nBuckets)),
        lit((nBuckets - 1).toLong)))
    val counts = vals.crossJoin(broadcast(stats))
      .select(b.cast("int").as("bucket"), col("is_a"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(col("is_a"), 0L).otherwise(1L)).as("c_b"))
    val spine = stats.select(
      explode(sequence(lit(0), lit(nBuckets - 1))).as("bucket"),
      col("n_a"), col("n_b"))
    val filled = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"),
        col("n_a"), col("n_b"))
    val pA = (col("c_a") + lit(1L)).cast("double") /
      (col("n_a") + lit(nBuckets.toLong)).cast("double")
    val pB = (col("c_b") + lit(1L)).cast("double") /
      (col("n_b") + lit(nBuckets.toLong)).cast("double")
    // (p_a − p_b) and log2(p_a/p_b) always share a sign, so every
    // contribution is ≥ 0 (up to the ladder's interpolation bias)
    val contribBits = (pA - pB) *
      (LanguageModel.surprisalBits(pB) - LanguageModel.surprisalBits(pA))
    filled.select(col("bucket"), col("c_a"), col("c_b"),
      floor(contribBits * lit(1e6) + lit(0.5)).cast("long").as("psi_microbits"))
  }

  /** One-row PSI summary: (n_a, n_b, psi_microbits) — total drift in
    * integer micro-bits (order-independent sum of the per-bucket
    * decomposition). Empty input → 0 drift. */
  def psi(df: DataFrame, value: Column, sideA: Column, nBuckets: Int): DataFrame =
    psiBuckets(df, value, sideA, nBuckets)
      .agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
        sum(col("psi_microbits")).as("psi_microbits"))
}
