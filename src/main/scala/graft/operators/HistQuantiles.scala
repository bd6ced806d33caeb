package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-state quantiles via fixed-grid histograms — the 100 TB
  * replacement for Spark's exact `percentile` aggregate.
  *
  * Why not exact `percentile`: its aggregation buffer holds every
  * distinct (value, count) pair and merges them all into ONE final
  * buffer, so on a ~unique-valued column the state is O(rows) on a
  * single task — an executor OOM at scale, not a slowdown. Why not
  * `approx_percentile`: its t-digest state is bounded but the merge
  * order is partition-dependent, so the result is not reproducible
  * across cluster sizes (and cannot be replayed by an engine-neutral
  * oracle).
  *
  * The histogram form is both bounded and deterministic:
  *
  *  1. one aggregate computes (n, min, max) — O(1) state;
  *  2. each value maps to a bucket on the fixed [lo, hi] grid
  *     (`floor((x−lo)/(hi−lo)·B)` clamped to B−1) and a groupBy(bucket)
  *     counts occupancy — O(B) state, map-side combinable, and the
  *     shuffle carries at most B integer rows;
  *  3. the quantile at probability p is the upper edge of the first
  *     bucket whose cumulative count reaches ⌈p·n⌉ — a window over at
  *     most B rows on one task.
  *
  * Every step is integer counting or the same IEEE double expression
  * evaluated in the same association order on any engine, so results
  * are bit-identical across cluster sizes AND fully replayable in a
  * DuckDB oracle (see [[dkCuts]]). The price is grid resolution: the
  * cut lands within (hi−lo)/B of the exact order statistic
  * (property-tested in HistQuantilesSpec).
  *
  * NaN policy (every form here): NaN is an absent measurement and is
  * excluded exactly like NULL. Without the filter, `max(x)` returns
  * NaN, the refinement range never closes, and grouped forms silently
  * drop whole groups — so exclusion is enforced in the value filter,
  * not assumed of the caller. The oracle mirrors carry the identical
  * `NOT isnan(...)` predicate.
  */
object HistQuantiles {

  /** Value filter shared by every form: NULL and NaN both mean
    * "no measurement". */
  private def finite(c: Column): Column = c.isNotNull && !isnan(c.cast("double"))

  /** Overflow-proof bucket index on [lo, hi] (column form). The naive
    * `(x−lo)/(hi−lo)` overflows to ±Inf when the data spans close to
    * ±1.7e308 (hi−lo > DoubleMax ⇒ every bucket collapses to 0/NaN and
    * refinement stops shrinking). Halving first keeps every
    * intermediate finite: x/2, lo/2, hi/2 ≤ DoubleMax/2, so
    * hi/2 − lo/2 ≤ DoubleMax. Halving is monotone (IEEE rounding is
    * monotone), so the mapping still partitions the range in value
    * order — which is all the exact forms need: they use the chosen
    * bucket's TRUE data min/max, never arithmetic bucket edges. The
    * one residual degeneracy (hi > lo but hi/2 == lo/2, subnormal
    * collapse) falls back to a two-way split at lo. */
  private def safeBucket(x: Column, lo: Column, hi: Column, nBuckets: Int): Column = {
    val span2 = hi / 2 - lo / 2
    when(hi === lo, lit(0L))
      .when(span2 === 0.0, when(x <= lo, lit(0L)).otherwise(lit((nBuckets - 1).toLong)))
      .otherwise(least(floor((x / 2 - lo / 2) / span2 * lit(nBuckets)),
        lit((nBuckets - 1).toLong)))
  }

  /** Grid-quantile cuts of `c` at probabilities `ps`: a 1-row frame
    * (qs array<double>, n, lo, hi). NULLs are excluded. Degenerate
    * inputs: constant column → every cut = lo; empty input → NULL cuts.
    */
  def cuts(df: DataFrame, c: Column, ps: Seq[Double], nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20),
      "nBuckets must be in [2, 2^20]")
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p < 1.0),
      "probabilities must lie strictly inside (0, 1)")
    val vals = df.filter(finite(c)).select(c.cast("double").as("x"))
    val stats = vals.agg(count(lit(1)).as("n"),
      min(col("x")).as("lo"), max(col("x")).as("hi"))
    // bucket: same expression, same association order as the oracle
    // mirror — ((x − lo) / (hi − lo)) · B, floored, clamped
    val b = when(col("hi") === col("lo"), lit(0L)).otherwise(
      least(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * lit(nBuckets)),
        lit((nBuckets - 1).toLong)))
    val counts = vals.crossJoin(broadcast(stats))
      .select(b.cast("int").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    // <= B rows from here on: the single-task window is bounded by
    // design; the constant partition key states that intent (and keeps
    // WindowExec's move-everything-to-one-partition warning out of
    // logs — here one partition IS the plan)
    // pmod(b, 1) = 0 for every row but is NOT foldable, so the
    // optimizer keeps it (a bare lit(0) is constant-folded out of the
    // partition spec and the warning returns)
    val w = Window.partitionBy(pmod(col("b"), lit(1))).orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("cnt")).over(w))
    val pickCols = ps.zipWithIndex.map { case (p, i) =>
      min(when(col("cum") >= ceil(lit(p) * col("n")), col("b"))).as(s"_b$i")
    }
    val picked = cum.crossJoin(broadcast(stats)).agg(pickCols.head, pickCols.tail: _*)
    picked.crossJoin(broadcast(stats))
      .select(array(ps.indices.map { i =>
          when(col("hi") === col("lo"), col("lo"))
            .otherwise(col("lo") +
              (col("hi") - col("lo")) * (col(s"_b$i") + lit(1)).cast("double") / lit(nBuckets))
        }: _*).as("qs"),
        col("n"), col("lo"), col("hi"))
  }

  /** Single-probability convenience: 1-row frame with one double
    * column named `as`. */
  def cut(df: DataFrame, c: Column, p: Double, nBuckets: Int, as: String): DataFrame =
    cuts(df, c, Seq(p), nBuckets).select(element_at(col("qs"), 1).as(as))

  /** MULTI-COLUMN grid quantile in ONE shared pass pair — the profiling
    * form: the same cut [[cut]] computes per column, but all columns
    * ride two scans total (one (n, lo, hi) aggregate, one bucket-count
    * aggregate over column-index-tagged pairs) instead of 2·k scans
    * for k separate calls. Per-column arithmetic — NULL/NaN exclusion,
    * bucket expression, rank target, bucket-edge read-off — is
    * IDENTICAL to [[cut]], so a per-column [[dkCuts]] oracle chain
    * replays each output unchanged. Output: a 1-row frame with one
    * double column per requested name. State is O(k·B) counts; the
    * exploded pair stream is k rows per input row but carries two ints
    * each and partial-aggregates map-side, so the shuffle stays ≤ k·B
    * rows. */
  def multiCut(df: DataFrame, cs: Seq[(Column, String)], p: Double, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20), "nBuckets must be in [2, 2^20]")
    require(p > 0.0 && p < 1.0, "probability must lie strictly inside (0, 1)")
    require(cs.nonEmpty && cs.size <= 64, "multiCut takes 1..64 columns")
    val k = cs.size
    val vals = df.select(cs.zipWithIndex.map { case ((c, _), i) =>
      when(finite(c), c.cast("double")).as(s"x$i") }: _*)
    val statCols = cs.indices.flatMap { i =>
      Seq(count(col(s"x$i")).as(s"n$i"),
        min(col(s"x$i")).as(s"lo$i"), max(col(s"x$i")).as(s"hi$i"))
    }
    val stats = vals.agg(statCols.head, statCols.tail: _*)
    // (column index, bucket) pairs; the per-column bucket uses the
    // column's own grid — same expression as [[cuts]]
    val selectPairs = vals.crossJoin(broadcast(stats)).select(
      posexplode(array(cs.indices.map { i =>
        val x = col(s"x$i"); val lo = col(s"lo$i"); val hi = col(s"hi$i")
        when(x.isNull, lit(null).cast("int")).otherwise(
          when(hi === lo, lit(0L)).otherwise(
            least(floor((x - lo) / (hi - lo) * lit(nBuckets)), lit((nBuckets - 1).toLong)))
            .cast("int"))
      }: _*)).as(Seq("ci", "b")))
      .filter(col("b").isNotNull)
    val counts = selectPairs.groupBy(col("ci"), col("b")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("ci")).orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(stats))
    val nOf = element_at(array(cs.indices.map(i => col(s"n$i")): _*), col("ci") + 1)
    val picks = cum
      .withColumn("hit", when(col("cum") >= ceil(lit(p) * nOf), col("b")))
      .groupBy(col("ci")).agg(min(col("hit")).as("bq"))
    val pickRow = picks.agg(
      cs.indices.map(i => min(when(col("ci") === i, col("bq"))).as(s"bq$i")).head,
      cs.indices.tail.map(i => min(when(col("ci") === i, col("bq"))).as(s"bq$i")): _*)
    pickRow.crossJoin(broadcast(stats)).select(cs.zipWithIndex.map { case ((_, name), i) =>
      val lo = col(s"lo$i"); val hi = col(s"hi$i")
      when(hi === lo, lo)
        .otherwise(lo + (hi - lo) * (col(s"bq$i") + lit(1)).cast("double") / lit(nBuckets))
        .as(name)
    }: _*)
  }

  /** PER-GROUP grid quantile — the grouped form of [[cut]]: one row
    * per group key with the group's cut value and row count. Total
    * aggregation state is O(groups × buckets) integer counts (vs
    * exact `percentile` whose per-group buffer holds every distinct
    * value the group has — the same one-task OOM as the global case,
    * multiplied by skew: the biggest group lands on one buffer).
    *
    * Shape: per-group (n, lo, hi) is a partial-agg rollup over GROUPS
    * (broadcast back — `broadcastStats = false` for key spaces too
    * wide to broadcast, where AQE picks the strategy); bucketing is
    * map-side; the cumulative window partitions BY GROUP so it
    * parallelizes across the key space (each partition holds ≤ B
    * rows by construction). NULL keys and NULL values are excluded. */
  def groupedCut(df: DataFrame, key: Column, c: Column, p: Double, nBuckets: Int,
      as: String, broadcastStats: Boolean = true): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20), "nBuckets must be in [2, 2^20]")
    require(p > 0.0 && p < 1.0, "probability must lie strictly inside (0, 1)")
    val vals = df.filter(finite(c) && key.isNotNull)
      .select(key.as("k"), c.cast("double").as("x"))
    val stats = vals.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("lo"), max(col("x")).as("hi"))
    val bStats = if (broadcastStats) broadcast(stats) else stats
    val b = when(col("hi") === col("lo"), lit(0L)).otherwise(
      least(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * lit(nBuckets)),
        lit((nBuckets - 1).toLong)))
    val counts = vals.join(bStats, Seq("k"))
      .select(col("k"), b.cast("int").as("b"))
      .groupBy(col("k"), col("b")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("k")).orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("cnt")).over(w))
    val picked = cum.join(bStats, Seq("k"))
      .groupBy(col("k"))
      .agg(min(when(col("cum") >= ceil(lit(p).cast("double") * col("n")), col("b"))).as("bq"))
    picked.join(bStats, Seq("k"))
      .select(col("k"),
        when(col("hi") === col("lo"), col("lo"))
          .otherwise(col("lo") +
            (col("hi") - col("lo")) * (col("bq") + lit(1)).cast("double") / lit(nBuckets))
          .as(as),
        col("n"))
  }

  /** Per-row CDF transform (quantile normalization): attach `as` =
    * the empirical CDF at the row's value, read off the fixed-grid
    * histogram — `cum(bucket(x)) / n`, quantized to the 1e-6 grid.
    * The monotone feature-scaling step (rank features before mixing
    * heterogeneous scores) with the same bounded-state machinery as
    * [[cuts]]: resolution is one bucket (ties within a bucket share a
    * rank), which is the price of O(buckets) state instead of a
    * corpus-wide sort. The histogram is O(B) rows and rides a
    * broadcast back onto the corpus — the corpus itself never
    * shuffles. NULL values get a NULL rank. */
  def cdf(df: DataFrame, c: Column, nBuckets: Int, as: String): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20), "nBuckets must be in [2, 2^20]")
    val vals = df.filter(finite(c)).select(c.cast("double").as("x"))
    val stats = vals.agg(count(lit(1)).as("n"),
      min(col("x")).as("lo"), max(col("x")).as("hi"))
    def bucketOf(x: Column): Column =
      when(col("hi") === col("lo"), lit(0L)).otherwise(
        least(floor((x - col("lo")) / (col("hi") - col("lo")) * lit(nBuckets)),
          lit((nBuckets - 1).toLong)))
    val counts = vals.crossJoin(broadcast(stats))
      .select(bucketOf(col("x")).cast("int").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(pmod(col("b"), lit(1))).orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("cnt")).over(w)).select(col("b"), col("cum"))
    df.crossJoin(broadcast(stats))
      .withColumn("_b", when(!finite(c), lit(null)).otherwise(
        bucketOf(c.cast("double")).cast("int")))
      .join(broadcast(cum), col("_b") === cum("b"), "left")
      .withColumn(as,
        when(!finite(c), lit(null))
          .otherwise(floor(col("cum").cast("double") / col("n").cast("double") * lit(1e6)
            + lit(0.5)) / lit(1e6)))
      .drop("_b", "b", "cum", "n", "lo", "hi")
  }

  /** EXACT order-statistic quantile with O(B) aggregation state — the
    * iterated refinement of [[cuts]] for when grid resolution isn't
    * enough and exact `percentile`'s O(distinct) single buffer is
    * banned ([[cuts]] scaladoc).
    *
    * Each round runs ONE map-side-combinable aggregate over the
    * current value range: `groupBy(bucket) → (count, min, max)` with
    * O(B) state; the driver picks the bucket containing the target
    * rank (a ≤ B-row parameter fetch, the k-means-centroid policy)
    * and the bucket's TRUE data min/max become the next round's
    * range — so the range filter is exact (no FP edge cases from
    * derived bucket bounds) and each round either finishes
    * (min == max) or shrinks the range by ~B×. Doubles have 64 bits,
    * so B = 4096 converges in ≤ ~7 rounds; a final ≤ B-distinct
    * cumulative pick shortcuts the tail. The range predicate reaches
    * the parquet scan, so later rounds prune row groups by min/max
    * stats — at 100 TB each refinement round READS less, not just
    * aggregates less.
    *
    * Rank rule: the value at 1-based ascending rank
    * ⌊p·(n−1)⌋ + 1 — DuckDB's `quantile_disc(x, p)` exactly, so the
    * oracle is a plain aggregate call, no replay needed (exactness is
    * the whole point). NULLs excluded; empty input → NULL value. */
  def exactCut(df: DataFrame, c: Column, p: Double, nBuckets: Int = 4096,
      as: String = "q", maxRounds: Int = 16,
      maxFallbackDistinct: Int = 1 << 20): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20), "nBuckets must be in [2, 2^20]")
    require(p > 0.0 && p < 1.0, "probability must lie strictly inside (0, 1)")
    val spark = df.sparkSession
    val vals = df.filter(finite(c)).select(c.cast("double").as("x"))
    val s0 = vals.agg(count(lit(1)).as("n"), min(col("x")).as("lo"),
      max(col("x")).as("hi")).head()
    val n = s0.getLong(0)
    def result(v: java.lang.Double): DataFrame = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
      spark.createDataFrame(
        java.util.Collections.singletonList(Row(v, n)),
        StructType(Seq(StructField(as, DoubleType, nullable = true),
          StructField("n", LongType, nullable = false))))
    }
    if (n == 0L) return result(null)
    var lo = s0.getDouble(1); var hi = s0.getDouble(2)
    var r = math.floor(p * (n - 1)).toLong + 1
    var rounds = 0
    while (lo < hi && rounds < maxRounds) {
      rounds += 1
      val b = safeBucket(col("x"), lit(lo), lit(hi), nBuckets).cast("int")
      val hist = vals.filter(col("x") >= lo && col("x") <= hi)
        .groupBy(b.as("b"))
        .agg(count(lit(1)).as("cnt"), min(col("x")).as("blo"), max(col("x")).as("bhi"))
        .orderBy(col("b").asc)
        .collect()
      var cum = 0L; var i = 0; var found = false
      while (!found && i < hist.length) {
        val row = hist(i); val cnt = row.getLong(1)
        if (cum + cnt >= r) {
          r -= cum; lo = row.getDouble(2); hi = row.getDouble(3); found = true
        } else { cum += cnt; i += 1 }
      }
      assert(found, s"rank $r not reachable — inconsistent histogram (concurrent input change?)")
    }
    if (lo < hi) {
      // rounds exhausted (adversarially concentrated data): exact pick
      // over the remaining range's DISTINCT values — bounded by what
      // ~B^maxRounds refinement left, partial-aggregable either way.
      // The driver collect is CAPPED (orderBy+limit plans as
      // TakeOrdered — bounded driver memory even mid-probe); a
      // pathological distribution past the cap falls back to the
      // DISTRIBUTED exact pick (range-partitioned sort + two-pass
      // prefix sum, driver state one row per partition) instead of
      // failing or ballooning the driver.
      val grpDf = vals.filter(col("x") >= lo && col("x") <= hi)
        .groupBy(col("x")).agg(count(lit(1)).cast("decimal(38,2)").as("ws"))
      val grp = grpDf.orderBy(col("x").asc).limit(maxFallbackDistinct + 1).collect()
      if (grp.length > maxFallbackDistinct) {
        val target = java.math.BigDecimal.valueOf(r)
        result(distributedPick(grpDf, java.math.BigDecimal.ZERO,
          cum => cum.compareTo(target) >= 0, hi))
      } else {
        var cum = 0L; var i = 0; var v = hi
        var found = false
        while (!found && i < grp.length) {
          cum += grp(i).getDecimal(1).longValueExact()
          if (cum >= r) { v = grp(i).getDouble(0); found = true } else i += 1
        }
        result(v)
      }
    } else result(lo)
  }

  /** PER-GROUP exact order-statistic quantile — [[exactCut]]'s grouped
    * form with NO driver loop: `rounds` refinement passes run
    * relationally for every group AT ONCE, then one exact pick
    * resolves each group's remaining range.
    *
    * Per round: join values to the per-group (lo, hi, r) state frame
    * (broadcast — O(groups)), bucket on each group's own range,
    * `groupBy(k, bucket) → (count, min, max)` with O(groups·buckets)
    * total state, a PER-GROUP window over ≤ B rows picks the bucket
    * holding rank r, and the bucket's true data min/max become the
    * group's next range. Each pass shrinks every group's range ~B×,
    * so `rounds` = 3 at B = 1024 gives ~30 bits of refinement; the
    * final pick (`groupBy(k, x)` restricted to each group's last
    * range + a per-group cumulative) is exact over whatever distinct
    * values remain — for real-world value distributions a handful,
    * degenerating gracefully (partial-aggregable, keyed windows,
    * spills not OOMs) if a group concentrates its mass at sub-range
    * scale. Rank rule = `quantile_disc` per group, so the oracle is
    * one grouped aggregate. NULL keys/values excluded. */
  def groupedExactCut(df: DataFrame, key: Column, c: Column, p: Double,
      nBuckets: Int = 1024, rounds: Int = 3, as: String = "q"): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20), "nBuckets must be in [2, 2^20]")
    require(p > 0.0 && p < 1.0, "probability must lie strictly inside (0, 1)")
    require(rounds >= 1 && rounds <= 8, "rounds must be in [1, 8]")
    val vals = df.filter(finite(c) && key.isNotNull)
      .select(key.as("k"), c.cast("double").as("x"))
    var state = vals.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("lo"), max(col("x")).as("hi"))
      .select(col("k"), col("n"),
        (floor(lit(p) * (col("n") - 1).cast("double")).cast("long") + 1).as("r"),
        col("lo"), col("hi"))
    for (_ <- 1 to rounds) {
      // state is rebuilt by LINEAGE otherwise: it is referenced twice
      // per round (hist join + rank join), so an unmaterialized plan
      // re-executes all prior rounds ~2× per round — 2^rounds re-scans
      // of the input at rounds=8. State is O(groups); pinning it each
      // round costs one tiny job and caps the whole operator at
      // `rounds` scans of the input.
      state = state.localCheckpoint()
      val b = safeBucket(col("x"), col("lo"), col("hi"), nBuckets).cast("int")
      val hist = vals.join(broadcast(state), Seq("k"))
        .filter(col("x") >= col("lo") && col("x") <= col("hi"))
        .groupBy(col("k"), b.as("b"))
        .agg(count(lit(1)).as("cnt"), min(col("x")).as("blo"), max(col("x")).as("bhi"))
      // pmod(b, 1) = 0 always but is non-foldable: with a CONSTANT key
      // (the exactCutFixed path) a bare partitionBy(k) folds away and
      // WindowExec warns per stage — same trick as [[cuts]]
      val w = Window.partitionBy(col("k"), pmod(col("b"), lit(1))).orderBy(col("b").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
        .join(broadcast(state.select(col("k"), col("n"), col("r"))), Seq("k"))
      // first (lowest) bucket whose cumulative reaches the rank; its
      // in-bucket residual rank and true data bounds seed the next round
      state = cum.filter(col("cum") >= col("r"))
        .groupBy(col("k"))
        .agg(max(col("n")).as("n"),
          min_by(struct((col("r") - (col("cum") - col("cnt"))).as("r2"),
            col("blo"), col("bhi")), col("b")).as("pick"))
        .select(col("k"), col("n"), col("pick.r2").as("r"),
          col("pick.blo").as("lo"), col("pick.bhi").as("hi"))
    }
    // exact pick over each group's final range (pmod: see round window)
    val wv = Window.partitionBy(col("k"), pmod(col("cnt"), lit(1))).orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals.join(broadcast(state), Seq("k"))
      .filter(col("x") >= col("lo") && col("x") <= col("hi"))
      .groupBy(col("k"), col("x")).agg(count(lit(1)).as("cnt"),
        max(col("r")).as("r"), max(col("n")).as("n"))
      .withColumn("cum", sum(col("cnt")).over(wv))
      .filter(col("cum") >= col("r"))
      .groupBy(col("k"))
      .agg(min(col("x")).as(as), max(col("n")).as("n"))
  }

  /** Fixed-rounds, fully relational GLOBAL exact quantile —
    * [[exactCut]]'s result with [[groupedExactCut]]'s execution shape:
    * a constant key feeds the grouped form and is dropped, so the
    * whole computation is one declarative plan with exactly `rounds`
    * refinement passes plus one exact pick. Unlike [[exactCut]]'s
    * driver loop (up to `maxRounds` SEQUENTIAL jobs, each collecting a
    * ≤ B-row histogram), the pass count here is fixed and data-
    * independent — the predictable-latency profile a 100 TB scan
    * schedule needs. The trade: [[exactCut]] iterates to range
    * closure, while this form's final pick degrades gracefully
    * (partial-aggregable groupBy over whatever distinct values remain
    * after rounds·log2(B) bits of refinement — spills, not OOMs, on
    * adversarially concentrated data). Empty input yields an empty
    * frame (the grouped form has no group to report), not a 1-row
    * NULL. */
  def exactCutFixed(df: DataFrame, c: Column, p: Double, nBuckets: Int = 4096,
      rounds: Int = 2, as: String = "q"): DataFrame =
    groupedExactCut(df, lit(0), c, p, nBuckets, rounds, as)
      .select(col(as), col("n"))

  /** Fixed-rounds, fully relational GLOBAL weighted exact quantile —
    * [[weightedCut]]'s result via [[groupedWeightedCut]] on a constant
    * key; see [[exactCutFixed]] for the shape rationale. Empty input
    * yields an empty frame. */
  def weightedCutFixed(df: DataFrame, c: Column, w: Column, pNum: Long = 1,
      pDen: Long = 2, nBuckets: Int = 4096, rounds: Int = 2, as: String = "q"): DataFrame =
    groupedWeightedCut(df, lit(0), c, w, pNum, pDen, nBuckets, rounds, as)
      .select(col(as), col("n"), col("total_w"))

  /** WEIGHTED exact quantile with bounded state — [[exactCut]] where
    * each row carries a weight (revenue-weighted median price, token-
    * weighted median quality score): the smallest x whose cumulative
    * weight reaches `pNum/pDen` of the total.
    *
    * The FP trap this form avoids: cumulative DOUBLE weight sums are
    * partition-order-dependent, so "cum ≥ p·W" can flip at the
    * boundary between engines or cluster sizes. Here weights are
    * decimal-quantized (exact, order-independent sums — the repo's
    * money policy) and the threshold test is pure integer/decimal
    * arithmetic: pDen·cum ≥ pNum·W — no division, no doubles, so the
    * pick is bit-identical on any engine and the oracle replays it
    * with a grouped cumulative. With unit weights this reduces to
    * [[exactCut]]'s `quantile_disc` rank rule (spec-pinned).
    *
    * Same refinement skeleton as [[exactCut]]: per round one
    * O(buckets) aggregate (weight sums replace counts), the chosen
    * bucket's true data min/max narrow the range, the range predicate
    * prunes row groups. Driver state is one BigDecimal accumulator.
    * Rows with NULL or non-positive weights are excluded. */
  def weightedCut(df: DataFrame, c: Column, w: Column, pNum: Long = 1, pDen: Long = 2,
      nBuckets: Int = 4096, as: String = "q", maxRounds: Int = 16,
      maxFallbackDistinct: Int = 1 << 20): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20), "nBuckets must be in [2, 2^20]")
    require(pNum > 0 && pNum < pDen, "need 0 < pNum/pDen < 1")
    val spark = df.sparkSession
    import java.math.BigDecimal
    val vals = df.filter(finite(c) && w.isNotNull && w > 0)
      .select(c.cast("double").as("x"), w.cast("decimal(30,2)").as("w"))
    val s0 = vals.agg(sum(col("w")).as("tw"), count(lit(1)).as("n"),
      min(col("x")).as("lo"), max(col("x")).as("hi")).head()
    val n = s0.getLong(1)
    def result(v: java.lang.Double, tw: java.lang.Double): DataFrame = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
      spark.createDataFrame(
        java.util.Collections.singletonList(Row(v, n, tw)),
        StructType(Seq(StructField(as, DoubleType, nullable = true),
          StructField("n", LongType, nullable = false),
          StructField("total_w", DoubleType, nullable = true))))
    }
    if (n == 0L) return result(null, null)
    val totalW = s0.getDecimal(0)
    // exact threshold: pick smallest x with pDen·cum(x) >= pNum·W
    val target = totalW.multiply(BigDecimal.valueOf(pNum))
    val den = BigDecimal.valueOf(pDen)
    var cumBefore = BigDecimal.ZERO
    var lo = s0.getDouble(2); var hi = s0.getDouble(3)
    var rounds = 0
    def reaches(cum: BigDecimal): Boolean = cum.multiply(den).compareTo(target) >= 0
    while (lo < hi && rounds < maxRounds) {
      rounds += 1
      val b = safeBucket(col("x"), lit(lo), lit(hi), nBuckets).cast("int")
      val hist = vals.filter(col("x") >= lo && col("x") <= hi)
        .groupBy(b.as("b"))
        .agg(sum(col("w")).as("ws"), min(col("x")).as("blo"), max(col("x")).as("bhi"))
        .orderBy(col("b").asc)
        .collect()
      var i = 0; var found = false
      while (!found && i < hist.length) {
        val row = hist(i); val ws = row.getDecimal(1)
        if (reaches(cumBefore.add(ws))) {
          lo = row.getDouble(2); hi = row.getDouble(3); found = true
        } else { cumBefore = cumBefore.add(ws); i += 1 }
      }
      assert(found, "weight target not reachable — inconsistent histogram")
    }
    if (lo < hi) {
      // same CAPPED fallback as [[exactCut]]: orderBy+limit plans as
      // TakeOrdered (bounded driver memory); an adversarial
      // all-one-bucket weighted distribution past the cap routes to
      // the same DISTRIBUTED exact pick (decimal threshold test
      // unchanged — the crossing partition scans with its exact
      // prefix offset, so the pick stays bit-identical).
      val grpDf = vals.filter(col("x") >= lo && col("x") <= hi)
        .groupBy(col("x")).agg(sum(col("w")).as("ws"))
      val grp = grpDf.orderBy(col("x").asc).limit(maxFallbackDistinct + 1).collect()
      if (grp.length > maxFallbackDistinct) {
        result(distributedPick(grpDf, cumBefore, reaches, hi), totalW.doubleValue())
      } else {
        var i = 0; var v = hi; var found = false
        while (!found && i < grp.length) {
          cumBefore = cumBefore.add(grp(i).getDecimal(1))
          if (reaches(cumBefore)) { v = grp(i).getDouble(0); found = true } else i += 1
        }
        result(v, totalW.doubleValue())
      }
    } else result(lo, totalW.doubleValue())
  }

  /** DISTRIBUTED exact cumulative-weight pick — the over-cap branch of
    * [[exactCut]]/[[weightedCut]]'s residual-range fallback. Finds the
    * smallest x in `grp` (columns `x: double`, `ws: decimal`, one row
    * per DISTINCT x) whose cumulative weight ascending in x, seeded
    * with `cumBefore`, satisfies `reaches` — without ever collecting
    * the value set:
    *
    *  1. range-partitioned distributed sort on x (RDD `sortBy` — the
    *     one imperative-RDD site in the quantile family; the pick
    *     needs partition-ORDER-aware prefix sums, which no relational
    *     window expresses without a SinglePartition sort);
    *  2. per-partition decimal weight totals — ONE collected row per
    *     partition (driver state O(partitions), not O(distinct));
    *  3. exact prefix offsets locate the single crossing partition,
    *     which re-scans locally with its seed offset.
    *
    * The threshold test is the caller's own decimal predicate, so the
    * pick is bit-identical to the driver-side scan it replaces —
    * INCLUDING the exhausted case: when no prefix ever satisfies
    * `reaches` (boundary/rounding-inconsistent input), both branches
    * return `default` (the caller's `hi`), rather than this one
    * throwing where the driver loop would have answered (ADVICE r12).
    * Two passes over the sorted RDD (persisted across them,
    * unpersisted on exit). */
  private def distributedPick(grp: DataFrame, cumBefore: java.math.BigDecimal,
      reaches: java.math.BigDecimal => Boolean, default: Double): Double = {
    import org.apache.spark.storage.StorageLevel
    val rdd = grp.select(col("x"), col("ws").cast("decimal(38,2)"))
      .rdd.map(r => (r.getDouble(0), r.getDecimal(1)))
      .sortBy(_._1)
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = rdd.mapPartitionsWithIndex { (i, it) =>
        var s = java.math.BigDecimal.ZERO
        while (it.hasNext) s = s.add(it.next()._2)
        Iterator((i, s))
      }.collect().sortBy(_._1).map(_._2)
      var acc = cumBefore; var hit = -1; var i = 0
      while (hit < 0 && i < totals.length) {
        val next = acc.add(totals(i))
        if (reaches(next)) hit = i else { acc = next; i += 1 }
      }
      if (hit < 0) return default // matches the driver loop's var v = hi seed
      val hitPart = hit; val seed = acc
      val picked = rdd.mapPartitionsWithIndex { (j, it) =>
        if (j != hitPart) Iterator.empty
        else {
          var cum = seed; var out = Iterator.empty: Iterator[Double]
          while (out.isEmpty && it.hasNext) {
            val (x, w) = it.next(); cum = cum.add(w)
            if (reaches(cum)) out = Iterator.single(x)
          }
          out
        }
      }.collect()
      picked.head
    } finally { rdd.unpersist(blocking = false); () }
  }

  /** PER-GROUP weighted exact quantile — [[weightedCut]]'s grouped
    * form, fully relational like [[groupedExactCut]] (no driver
    * state at all: even the cumulative-weight-before-range
    * accumulator is a decimal COLUMN in the state frame). The
    * threshold test stays pure decimal arithmetic —
    * pDen·(cumBefore + cum) ≥ pNum·W — evaluated identically by the
    * oracle's grouped cumulative, so picks cannot flip at FP
    * boundaries. Decimal sums ride Spark's decimal(38,2) cap;
    * overflow there would need a single group's weight mass above
    * 10^36, at which point the weight column itself is mis-modeled.
    * Rows with NULL keys/values or non-positive weights are
    * excluded. */
  def groupedWeightedCut(df: DataFrame, key: Column, c: Column, w: Column,
      pNum: Long = 1, pDen: Long = 2, nBuckets: Int = 1024, rounds: Int = 2,
      as: String = "q"): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20), "nBuckets must be in [2, 2^20]")
    require(pNum > 0 && pNum < pDen, "need 0 < pNum/pDen < 1")
    require(rounds >= 1 && rounds <= 8, "rounds must be in [1, 8]")
    val vals = df.filter(finite(c) && key.isNotNull && w.isNotNull && w > 0)
      .select(key.as("k"), c.cast("double").as("x"), w.cast("decimal(30,2)").as("wt"))
    val reaches = (cumBefore: Column, cum: Column, tw: Column) =>
      (cumBefore + cum) * lit(pDen) >= tw * lit(pNum)
    var state = vals.groupBy(col("k"))
      .agg(sum(col("wt")).as("tw"), count(lit(1)).as("n"),
        min(col("x")).as("lo"), max(col("x")).as("hi"))
      .withColumn("cb", (col("tw") - col("tw")).cast("decimal(38,2)")) // typed zero
    for (_ <- 1 to rounds) {
      // materialized per round for the same lineage reason as
      // [[groupedExactCut]] — O(groups) rows, referenced twice below
      state = state.localCheckpoint()
      val b = safeBucket(col("x"), col("lo"), col("hi"), nBuckets).cast("int")
      val hist = vals.join(broadcast(state), Seq("k"))
        .filter(col("x") >= col("lo") && col("x") <= col("hi"))
        .groupBy(col("k"), b.as("b"))
        .agg(sum(col("wt")).as("ws"), min(col("x")).as("blo"), max(col("x")).as("bhi"))
      val wd = Window.partitionBy(col("k"), pmod(col("b"), lit(1))).orderBy(col("b").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("ws")).over(wd))
        .join(broadcast(state.select(col("k"), col("tw"), col("n"), col("cb"))), Seq("k"))
      state = cum.filter(reaches(col("cb"), col("cum"), col("tw")))
        .groupBy(col("k"))
        .agg(max(col("tw")).as("tw"), max(col("n")).as("n"),
          min_by(struct((col("cb") + col("cum") - col("ws")).as("cb2"),
            col("blo"), col("bhi")), col("b")).as("pick"))
        .select(col("k"), col("tw"), col("n"),
          col("pick.blo").as("lo"), col("pick.bhi").as("hi"),
          col("pick.cb2").cast("decimal(38,2)").as("cb"))
    }
    val wx = Window.partitionBy(col("k"), pmod(col("n"), lit(1))).orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals.join(broadcast(state), Seq("k"))
      .filter(col("x") >= col("lo") && col("x") <= col("hi"))
      .groupBy(col("k"), col("x"))
      .agg(sum(col("wt")).as("ws"), max(col("tw")).as("tw"),
        max(col("n")).as("n"), max(col("cb")).as("cb"))
      .withColumn("cum", sum(col("ws")).over(wx))
      .filter(reaches(col("cb"), col("cum"), col("tw")))
      .groupBy(col("k"))
      .agg(min(col("x")).as(as), max(col("n")).as("n"),
        max(col("tw")).cast("double").as("total_w"))
  }

  // ------------------------------------------------------------ oracle

  /** DuckDB CTE chain replaying [[cuts]] exactly for one probability:
    * emits CTEs `<tag>_s` (stats), `<tag>_c` (bucket counts), `<tag>_u`
    * (cumulative), `<tag>_p` (picked bucket) and `<tag>` (1 row, one
    * column `<valueName>`). `src` must be a relation exposing the
    * metric as `<x>`; callers splice the fragments with the shared
    * WITH. */
  def dkCuts(tag: String, src: String, x: String, p: Double, nBuckets: Int,
      valueName: String): String = {
    val bMax = nBuckets - 1
    s"""${tag}_s AS (
       |  SELECT count(*) AS n, CAST(min($x) AS DOUBLE) AS lo, CAST(max($x) AS DOUBLE) AS hi
       |  FROM $src WHERE $x IS NOT NULL AND NOT isnan(CAST($x AS DOUBLE))
       |), ${tag}_c AS (
       |  SELECT b, count(*) AS cnt FROM (
       |    SELECT CASE WHEN hi = lo THEN 0
       |           ELSE CAST(least(floor((CAST($x AS DOUBLE) - lo) / (hi - lo) * $nBuckets), $bMax) AS INT) END AS b
       |    FROM $src, ${tag}_s WHERE $x IS NOT NULL AND NOT isnan(CAST($x AS DOUBLE)))
       |  GROUP BY 1
       |), ${tag}_u AS (
       |  SELECT b, sum(cnt) OVER (ORDER BY b ASC ROWS UNBOUNDED PRECEDING) AS cum FROM ${tag}_c
       |), ${tag}_p AS (
       |  -- CAST: DuckDB parses a bare decimal literal as DECIMAL (exact
       |  -- arithmetic) while Spark's lit(p) is DOUBLE — the rank target
       |  -- must come from the identical IEEE product on both engines
       |  SELECT min(CASE WHEN cum >= ceil(CAST($p AS DOUBLE) * n) THEN b END) AS bq FROM ${tag}_u, ${tag}_s
       |), $tag AS (
       |  SELECT CASE WHEN hi = lo THEN lo
       |         ELSE lo + (hi - lo) * CAST(bq + 1 AS DOUBLE) / $nBuckets END AS $valueName
       |  FROM ${tag}_p, ${tag}_s
       |)""".stripMargin
  }

  /** DuckDB CTE chain replaying [[groupedCut]]: emits `<tag>` with one
    * row per group — columns (k, <valueName>, n). `src` must expose
    * the group key as `<k>` and the metric as `<x>`. Same arithmetic,
    * same association order as the Spark side. */
  def dkGroupedCut(tag: String, src: String, k: String, x: String, p: Double,
      nBuckets: Int, valueName: String): String = {
    val bMax = nBuckets - 1
    s"""${tag}_s AS (
       |  SELECT $k AS k, count(*) AS n, CAST(min($x) AS DOUBLE) AS lo, CAST(max($x) AS DOUBLE) AS hi
       |  FROM $src WHERE $x IS NOT NULL AND NOT isnan(CAST($x AS DOUBLE)) AND $k IS NOT NULL GROUP BY 1
       |), ${tag}_c AS (
       |  SELECT k, b, count(*) AS cnt FROM (
       |    SELECT s.k, CASE WHEN s.hi = s.lo THEN 0
       |           ELSE CAST(least(floor((CAST(v.$x AS DOUBLE) - s.lo) / (s.hi - s.lo) * $nBuckets), $bMax) AS INT) END AS b
       |    FROM $src v JOIN ${tag}_s s ON v.$k = s.k WHERE v.$x IS NOT NULL AND NOT isnan(CAST(v.$x AS DOUBLE)))
       |  GROUP BY 1, 2
       |), ${tag}_u AS (
       |  SELECT k, b, sum(cnt) OVER (PARTITION BY k ORDER BY b ASC ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM ${tag}_c
       |), ${tag}_p AS (
       |  SELECT u.k, min(CASE WHEN u.cum >= ceil(CAST($p AS DOUBLE) * s.n) THEN u.b END) AS bq
       |  FROM ${tag}_u u JOIN ${tag}_s s ON u.k = s.k GROUP BY 1
       |), $tag AS (
       |  SELECT s.k, CASE WHEN s.hi = s.lo THEN s.lo
       |         ELSE s.lo + (s.hi - s.lo) * CAST(p.bq + 1 AS DOUBLE) / $nBuckets END AS $valueName,
       |         s.n
       |  FROM ${tag}_p p JOIN ${tag}_s s ON p.k = s.k
       |)""".stripMargin
  }
}
