package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-state histogram quantiles: grid accuracy vs the exact order
  * statistic, degenerate shapes, and the plan-level proof that the
  * unbounded `percentile` buffer is gone from every former call site. */
class HistQuantilesSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("cuts land within one bucket width of the exact order statistic") {
    // deterministic pseudo-random values (LCG), including duplicates
    val xs = (1 to 5000).map(i => ((i * 1103515245L + 12345) % 1000003L).toDouble / 7.0)
    val df = xs.toDF("x")
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val b = 4096
    val row = HistQuantiles.cuts(df, col("x"), ps, b).head()
    val qs = row.getSeq[Double](0)
    val (lo, hi) = (xs.min, xs.max)
    val width = (hi - lo) / b
    val sorted = xs.sorted
    ps.zipWithIndex.foreach { case (p, i) =>
      // exact inverse-CDF order statistic at rank ceil(p*n)
      val exact = sorted(math.ceil(p * xs.size).toInt - 1)
      assert(math.abs(qs(i) - exact) <= width + 1e-9,
        s"p=$p cut=${qs(i)} exact=$exact width=$width")
    }
  }

  test("cut is an upper bound: at least ceil(p*n) values sit at or below it") {
    val xs = (1 to 3000).map(i => ((i * 48271L) % 2147483647L).toDouble)
    val df = xs.toDF("x")
    val p = 0.5
    val q = HistQuantiles.cut(df, col("x"), p, 1024, "m").head().getDouble(0)
    val atOrBelow = xs.count(_ <= q)
    assert(atOrBelow >= math.ceil(p * xs.size).toInt)
  }

  test("constant column: every cut equals the constant; empty input: NULL cuts") {
    val const = Seq.fill(100)(42.5).toDF("x")
    val qs = HistQuantiles.cuts(const, col("x"), Seq(0.2, 0.8), 64).head().getSeq[Double](0)
    assert(qs == Seq(42.5, 42.5))
    val empty = Seq.empty[Double].toDF("x")
    val r = HistQuantiles.cuts(empty, col("x"), Seq(0.5), 64).head()
    assert(r.isNullAt(0) || r.getSeq[Any](0).forall(_ == null))
  }

  test("NULLs are excluded from the grid and the ranks") {
    val df = (Seq.fill(50)(Option.empty[Double]) ++ (1 to 100).map(i => Some(i.toDouble)))
      .toDF("x")
    val q = HistQuantiles.cut(df, col("x"), 0.5, 1000, "m").head().getDouble(0)
    // median of 1..100 is near 50, far from what NULL-counting would give
    assert(q >= 49.0 && q <= 52.0, s"median=$q")
  }

  test("aggregation state is O(buckets): bucket HashAggregate with partial_count, no percentile buffer") {
    val p = plan(HistQuantiles.cuts((1 to 100).map(_.toDouble).toDF("v"), col("v"), Seq(0.5), 256))
    assert(!p.toLowerCase.contains("percentile"), p)
    // the occupancy count is a plain partial-aggregatable HashAggregate
    // keyed on the bucket — at most 256 rows cross the wire
    assert(p.contains("HashAggregate(keys=[b"), p)
    assert(p.contains("partial_count"), p)
  }

  test("groupedCut: each group's cut lands within one bucket width of the group's exact median") {
    val rows = (1 to 4000).map { i =>
      val g = s"g${i % 4}"
      val x = ((i * 1103515245L + 12345) % 1000003L).toDouble / 7.0 + (i % 4) * 1e4
      (g, x)
    }
    val df = rows.toDF("g", "x")
    val b = 2048
    val got = HistQuantiles.groupedCut(df, col("g"), col("x"), 0.5, b, "med")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val xs = grp.map(_._2).sorted
      val exact = xs(math.ceil(0.5 * xs.size).toInt - 1)
      val width = (xs.max - xs.min) / b
      val (med, n) = got(g)
      assert(n == xs.size, s"$g n")
      assert(math.abs(med - exact) <= width + 1e-9, s"$g med=$med exact=$exact width=$width")
    }
  }

  test("groupedCut: NULL keys and NULL values excluded; constant group returns the constant") {
    val data = (Seq.fill(20)(("c", 7.25)) ++ (1 to 30).map(i => ("b", i.toDouble)) ++
      Seq((null.asInstanceOf[String], 99.0))).toDF("g", "x")
    val got = HistQuantiles.groupedCut(data, col("g"), col("x"), 0.5, 64, "med")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("b", "c"))
    assert(got("c") == 7.25)
  }

  test("groupedCut plan: no percentile buffer, bucket counts are partial-agg, window partitions by group") {
    val df = (1 to 300).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "x")
    val p = plan(HistQuantiles.groupedCut(df, col("g"), col("x"), 0.5, 128, "med"))
    assert(!p.toLowerCase.contains("percentile"), p)
    assert(!p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_count"), p)
    // the cumulative window is keyed by the group, not a global sort
    assert(p.contains("windowspecdefinition(k"), p)
  }

  test("cdf: monotone in the value, max rank = 1, within one bucket of the exact empirical CDF") {
    val xs = (1 to 2000).map(i => ((i * 48271L) % 99991L).toDouble)
    val df = xs.toDF("x")
    val b = 1024
    val got = HistQuantiles.cdf(df, col("x"), b, "pct")
      .select(col("x"), col("pct")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1))
    val sorted = got.sortBy(_._1)
    sorted.sliding(2).foreach { w => assert(w(0)._2 <= w(1)._2 + 1e-12) }
    assert(sorted.last._2 == 1.0)
    val n = xs.size.toDouble
    // the histogram CDF can lag/lead the exact empirical CDF by at
    // most the occupancy of one bucket's worth of value range
    val xsSorted = xs.sorted
    got.foreach { case (x, pct) =>
      val exact = xsSorted.count(_ <= x) / n
      val bucketSpan = (xs.max - xs.min) / b
      val nearby = xsSorted.count(v => math.abs(v - x) <= bucketSpan) / n
      assert(math.abs(pct - exact) <= nearby + 1e-6, s"x=$x pct=$pct exact=$exact")
    }
  }

  test("cdf: NULL values keep NULL ranks and non-null count is preserved") {
    val df = (Seq.fill(5)(Option.empty[Double]) ++ (1 to 95).map(i => Some(i.toDouble)))
      .toDF("x")
    val out = HistQuantiles.cdf(df, col("x"), 64, "pct")
    assert(out.count() == 100)
    assert(out.filter(col("pct").isNull).count() == 5)
    assert(out.filter(col("x").isNotNull && col("pct").isNotNull).count() == 95)
  }

  test("grouped MAD screen catches small-scale outliers a global screen would drown") {
    // group A runs at ~1000 with spread ~100; group B at ~1 with
    // spread ~0.1 plus one planted outlier at 5 — globally invisible
    // (|5 - median| is tiny on A's scale), obvious within B
    val rows = (1 to 500).map(i => ("A", 1000.0 + (i % 100))) ++
      (1 to 500).map(i => ("B", 1.0 + (i % 10) / 100.0)) :+ ("B", 5.0)
    val df = rows.toDF("g", "x")
    val byGroup = graft.analytics.StatsOps.madScreenByGroup(df, col("g"), col("x"),
        zCut = 3.0, buckets = 4096)
      .select(col("g"), col("x")).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(byGroup.contains(("B", 5.0)), s"planted B outlier missed: ${byGroup.toSeq}")
    // constant group exclusion: no divide error, no rows
    val const = (1 to 50).map(_ => ("C", 2.0)).toDF("g", "x")
    assert(graft.analytics.StatsOps.madScreenByGroup(const, col("g"), col("x"),
      3.0, 64).count() == 0)
  }

  test("former percentile call sites carry no unbounded-state aggregate in their plans") {
    val stats = Seq(
      graft.analytics.StatsOps.decilesOrders(spark, dir),
      graft.analytics.StatsOps.madOutliers(spark, dir),
      graft.analytics.StatsOps.gridMedianEvents(spark, dir),
      graft.analytics.DataOps.profileEvents(spark, dir))
    stats.foreach { df =>
      val p = plan(df)
      assert(!p.toLowerCase.contains("percentile"), p.take(2000))
      // ObjectHashAggregate is the executor of TypedImperative aggs
      // (percentile's home); its absence means every aggregate here is
      // a codegen HashAggregate with fixed-width state
      assert(!p.contains("ObjectHashAggregate"), p.take(2000))
    }
  }

  test("exactCut returns the EXACT quantile_disc order statistic (rank floor(p(n-1))+1)") {
    val rng = new scala.util.Random(42)
    // duplicates, negatives, magnitudes spanning 9 decades
    val xs = Seq.fill(2000)(rng.nextInt(40) match {
      case k if k < 10 => rng.nextInt(5).toDouble          // heavy dup mass
      case k if k < 20 => -rng.nextDouble() * 1e6
      case k if k < 30 => rng.nextDouble()
      case _           => rng.nextDouble() * 1e3
    })
    val df = xs.toDF("x").repartition(7)
    val sorted = xs.sorted
    for (p <- Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val expect = sorted(math.floor(p * (xs.size - 1)).toInt)
      val got = HistQuantiles.exactCut(df, col("x"), p, nBuckets = 16)
        .head()
      assert(got.getDouble(0) == expect, s"p=$p")
      assert(got.getLong(1) == xs.size)
    }
  }

  test("exactCut fallback: capped TakeOrdered probe under the cap, distributed pick past it") {
    // maxRounds = 0 forces the residual-range fallback over ALL values —
    // the adversarial all-one-bucket shape the cap exists for
    val df = (1 to 200).map(_.toDouble).toDF("x")
    val ok = HistQuantiles.exactCut(df, col("x"), 0.5,
      maxRounds = 0, maxFallbackDistinct = 1000).head()
    // quantile_disc rank floor(0.5*199)+1 = 100 → value 100.0
    assert(ok.getDouble(0) == 100.0)
    // past the cap: SAME exact answer via the distributed pick (range-
    // partitioned sort + prefix offsets), never a failure or an
    // uncapped driver collect — on multi-partition input, with dups
    val big = (1 to 200).flatMap(i => Seq(i.toDouble, i.toDouble)).toDF("x").repartition(7)
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val sorted = (1 to 200).flatMap(i => Seq(i.toDouble, i.toDouble)).sorted
      val expect = sorted(math.floor(p * (sorted.size - 1)).toInt)
      val got = HistQuantiles.exactCut(big, col("x"), p,
        maxRounds = 0, maxFallbackDistinct = 50).head()
      assert(got.getDouble(0) == expect, s"p=$p distributed pick")
    }
  }

  test("exactCut degenerate inputs: constant column, single row, empty, 1-ulp range") {
    val const = Seq.fill(50)(7.25).toDF("x")
    assert(HistQuantiles.exactCut(const, col("x"), 0.5).head().getDouble(0) == 7.25)
    val one = Seq(3.5).toDF("x")
    assert(HistQuantiles.exactCut(one, col("x"), 0.9).head().getDouble(0) == 3.5)
    val empty = Seq.empty[Double].toDF("x")
    val r = HistQuantiles.exactCut(empty, col("x"), 0.5).head()
    assert(r.isNullAt(0) && r.getLong(1) == 0L)
    // two values one ulp apart: refinement must terminate and pick exactly
    val lo = 1.0; val hi = java.lang.Math.nextUp(lo)
    val tight = (Seq.fill(30)(lo) ++ Seq.fill(10)(hi)).toDF("x")
    assert(HistQuantiles.exactCut(tight, col("x"), 0.5).head().getDouble(0) == lo)
    assert(HistQuantiles.exactCut(tight, col("x"), 0.9).head().getDouble(0) == hi)
  }

  test("weightedCut fallback: capped probe under the cap, distributed pick past it") {
    // maxRounds = 0 forces the residual-range fallback over ALL values —
    // the adversarial all-one-bucket WEIGHTED shape (the exactCut cap's
    // twin: same TakeOrdered-bounded probe, same distributed escape)
    val df = (1 to 200).map(i => (i.toDouble, 1.0)).toDF("x", "w")
    val ok = HistQuantiles.weightedCut(df, col("x"), col("w"),
      maxRounds = 0, maxFallbackDistinct = 1000).head()
    // unit weights reduce to the median-by-cumulative-weight pick: the
    // smallest x with 2·cum >= W is x = 100
    assert(ok.getDouble(0) == 100.0)
    // past the cap: same decimal threshold test, same pick, through the
    // distributed path — skewed weights, multi-partition, duplicate x
    val rows = (1 to 200).map(i => (i.toDouble, i * 0.5)) ++ Seq((60.0, 5000.0))
    val big = rows.toDF("x", "w").repartition(7)
    val expect = {
      val sorted = rows.sortBy(_._1)
      val total = BigDecimal(sorted.map(r => BigDecimal(r._2).setScale(2)).sum.toString)
      var cum = BigDecimal(0); var v = sorted.last._1; var found = false
      for ((x, w) <- sorted if !found) {
        cum += BigDecimal(w).setScale(2)
        if (cum * 2 >= total) { v = x; found = true }
      }
      v
    }
    val got = HistQuantiles.weightedCut(big, col("x"), col("w"),
      maxRounds = 0, maxFallbackDistinct = 50).head()
    assert(got.getDouble(0) == expect, "distributed weighted pick")
  }

  test("weightedCut == brute-force weighted quantile, with ties and duplicate weights") {
    val rng = new scala.util.Random(21)
    val rows = Seq.fill(800)((rng.nextInt(40).toDouble, (rng.nextInt(50) + 1) * 0.5)) ++
      Seq((7.0, 300.0)) // one dominating weight
    val df = rows.toDF("x", "w").repartition(5)
    for ((num, den) <- Seq((1L, 2L), (1L, 4L), (9L, 10L))) {
      val total = BigDecimal(rows.map(r => BigDecimal(r._2)).sum.toString)
      val sorted = rows.groupBy(_._1).view.mapValues(_.map(r => BigDecimal(r._2)).sum)
        .toSeq.sortBy(_._1)
      var cum = BigDecimal(0); var expect = sorted.last._1; var found = false
      sorted.foreach { case (x, wx) =>
        cum += wx
        if (!found && cum * BigDecimal(den) >= total * BigDecimal(num)) {
          expect = x; found = true
        }
      }
      val got = HistQuantiles.weightedCut(df, col("x"), col("w"), num, den, nBuckets = 8)
        .head()
      assert(got.getDouble(0) == expect, s"p=$num/$den")
      assert(got.getLong(1) == rows.size)
    }
  }

  test("weightedCut with unit weights reduces to the quantile_disc rank rule") {
    val rng = new scala.util.Random(31)
    for (n <- Seq(4, 5, 101)) {
      val xs = Seq.fill(n)(rng.nextDouble() * 100)
      val df = xs.map((_, 1.0)).toDF("x", "w")
      val wm = HistQuantiles.weightedCut(df, col("x"), col("w"), 1, 2, nBuckets = 8)
        .head().getDouble(0)
      val disc = xs.sorted.apply(math.floor(0.5 * (n - 1)).toInt)
      assert(wm == disc, s"n=$n")
    }
  }

  test("weightedCut degenerate inputs: empty, non-positive weights excluded, constant column") {
    val empty = Seq.empty[(Double, Double)].toDF("x", "w")
    assert(HistQuantiles.weightedCut(empty, col("x"), col("w")).head().isNullAt(0))
    val negOnly = Seq((1.0, -2.0), (2.0, 0.0)).toDF("x", "w")
    assert(HistQuantiles.weightedCut(negOnly, col("x"), col("w")).head().isNullAt(0))
    val const = Seq((5.5, 1.0), (5.5, 9.0)).toDF("x", "w")
    val r = HistQuantiles.weightedCut(const, col("x"), col("w")).head()
    assert(r.getDouble(0) == 5.5 && r.getLong(1) == 2 && r.getDouble(2) == 10.0)
  }

  test("groupedWeightedCut == per-group weighted brute force; agrees with global weightedCut") {
    val rng = new scala.util.Random(17)
    val rows = Seq.fill(1200) {
      val g = s"g${rng.nextInt(4)}"
      (g, rng.nextInt(30).toDouble, (rng.nextInt(20) + 1) * 0.25)
    } ++ Seq(("g0", 3.0, 500.0), ("solo", 1.5, 2.0)) // dominating weight + 1-row group
    val df = rows.toDF("g", "x", "w").repartition(6)
    val got = HistQuantiles.groupedWeightedCut(df, col("g"), col("x"), col("w"),
        nBuckets = 8, rounds = 2)
      .as[(String, Double, Long, Double)].collect()
      .map { case (g, q, n, tw) => g -> ((q, n, tw)) }.toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val total = rs.map(r => BigDecimal(r._3)).sum
      val sorted = rs.groupBy(_._2).view.mapValues(_.map(r => BigDecimal(r._3)).sum)
        .toSeq.sortBy(_._1)
      var cum = BigDecimal(0); var expect = sorted.last._1; var found = false
      sorted.foreach { case (x, wx) =>
        cum += wx
        if (!found && cum * 2 >= total) { expect = x; found = true }
      }
      assert(got(g)._1 == expect, s"group $g")
      assert(got(g)._2 == rs.size, s"group $g n")
      // per-group result equals the GLOBAL operator run on the slice
      val solo = HistQuantiles.weightedCut(
        df.filter(col("g") === g), col("x"), col("w"), nBuckets = 8).head()
      assert(got(g)._1 == solo.getDouble(0), s"group $g vs global")
    }
  }

  test("groupedExactCut == per-group quantile_disc brute force") {
    val rng = new scala.util.Random(13)
    val rows = Seq.tabulate(3000) { i =>
      val g = s"g${i % 6}"
      val x = g match {
        case "g0" => 42.0                              // constant group
        case "g1" => rng.nextInt(3).toDouble           // 3 distinct values
        case _    => rng.nextDouble() * 1e4 - 5e3
      }
      (g, x)
    } :+ (("solo", 9.5))                               // single-row group
    val df = rows.toDF("g", "x").repartition(7)
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val expect = rows.groupBy(_._1).map { case (g, rs) =>
        val xs = rs.map(_._2).sorted
        (g, xs(math.floor(p * (xs.size - 1)).toInt), xs.size.toLong)
      }.toSet
      val got = HistQuantiles.groupedExactCut(df, col("g"), col("x"), p,
          nBuckets = 8, rounds = 3)
        .as[(String, Double, Long)].collect().toSet
      assert(got == expect, s"p=$p")
    }
  }

  test("groupedExactCut agrees with exactCut run per group on the harness events table") {
    val ev = graft.Tables.events(spark, dir)
    val grouped = HistQuantiles.groupedExactCut(ev, col("event_type"), col("value"), 0.5)
      .as[(String, Double, Long)].collect()
      .map { case (g, q, n) => g -> ((q, n)) }.toMap
    grouped.keys.foreach { g =>
      val solo = HistQuantiles.exactCut(ev.filter(col("event_type") === g),
        col("value"), 0.5).head()
      assert(grouped(g) == ((solo.getDouble(0), solo.getLong(1))), g)
    }
  }

  test("NaN values are excluded like NULL in every form — no silent min-for-any-p, no vanished groups") {
    // Without the filter: max(x) = NaN makes exactCut's range never
    // close (returns min for ANY p); in grouped forms the range
    // predicate x <= NaN drops every row of a NaN-containing group.
    val clean = (1 to 100).map(_.toDouble)
    val dirty = (clean.map(Some(_)) ++ Seq.fill(7)(Some(Double.NaN)) ++ Seq(None)).toDF("x")
    val expectMedian = clean.sorted.apply(math.floor(0.5 * (clean.size - 1)).toInt)
    val ex = HistQuantiles.exactCut(dirty, col("x"), 0.5).head()
    assert(ex.getDouble(0) == expectMedian && ex.getLong(1) == clean.size)
    assert(ex.getDouble(0) != clean.min) // the failure mode ADVICE described
    val g = (clean.map(x => ("a", x)) ++ Seq(("a", Double.NaN), ("b", Double.NaN), ("b", 5.0)))
      .toDF("g", "x")
    val ge = HistQuantiles.groupedExactCut(g, col("g"), col("x"), 0.5, nBuckets = 8, rounds = 2)
      .as[(String, Double, Long)].collect().map { case (k, q, n) => (k, (q, n)) }.toMap
    assert(ge.keySet == Set("a", "b"), "NaN-containing groups must not vanish")
    assert(ge("a") == ((expectMedian, clean.size.toLong)) && ge("b") == ((5.0, 1L)))
    val grid = HistQuantiles.cut(dirty, col("x"), 0.5, 1024, "m").head().getDouble(0)
    assert(grid >= 49.0 && grid <= 52.0, s"grid median with NaN present: $grid")
    val wc = HistQuantiles.weightedCut(
      (clean.map((_, 1.0)) :+ ((Double.NaN, 50.0))).toDF("x", "w"), col("x"), col("w")).head()
    assert(wc.getDouble(0) == expectMedian && wc.getLong(1) == clean.size)
  }

  test("full-double-span range (hi - lo overflows to Inf) still refines and returns the exact pick") {
    // (x - lo)/(hi - lo) on this data is (finite)/Inf = 0 for every
    // row: with the naive bucket every round is a no-op and the
    // fallback collects O(distinct) rows. The halved form keeps every
    // intermediate finite, so refinement actually shrinks.
    val extremes = Seq(-1.7e308, -8.5e307, -42.0, 0.0, 1.0, 7.5, 9.9e307, 1.7e308)
    val xs = extremes ++ (1 to 500).map(i => i * 11.5 - 3000.0)
    val df = xs.toDF("x").repartition(5)
    val sorted = xs.sorted
    for (p <- Seq(0.01, 0.5, 0.99)) {
      val expect = sorted(math.floor(p * (xs.size - 1)).toInt)
      assert(HistQuantiles.exactCut(df, col("x"), p, nBuckets = 16).head().getDouble(0)
        == expect, s"p=$p")
    }
    // grouped form, one group spanning the full double range
    val g = xs.map(("w", _)).toDF("g", "x")
    val got = HistQuantiles.groupedExactCut(g, col("g"), col("x"), 0.5,
      nBuckets = 8, rounds = 3).head()
    assert(got.getDouble(1) == sorted(math.floor(0.5 * (xs.size - 1)).toInt))
    // weighted form over the same span: equal weights reduce to the
    // smallest x whose cumulative count reaches half of n
    val wdf = xs.map((_, 2.0)).toDF("x", "w")
    val wm = HistQuantiles.weightedCut(wdf, col("x"), col("w"), 1, 2, nBuckets = 16).head()
    val wExpect = sorted(math.ceil(xs.size / 2.0).toInt - 1)
    assert(wm.getDouble(0) == wExpect)
  }

  test("grouped refinement at rounds=8 stays exact (state materialized per round, no lineage blowup)") {
    val rng = new scala.util.Random(99)
    val rows = Seq.tabulate(2000)(i => (s"g${i % 3}", rng.nextDouble() * 1e6))
    val df = rows.toDF("g", "x").repartition(4)
    val got = HistQuantiles.groupedExactCut(df, col("g"), col("x"), 0.5,
        nBuckets = 4, rounds = 8)
      .as[(String, Double, Long)].collect().map { case (k, q, _) => (k, q) }.toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val xs = rs.map(_._2).sorted
      assert(got(g) == xs(math.floor(0.5 * (xs.size - 1)).toInt), g)
    }
  }

  test("multiCut == per-column cut on the events table (shared pass changes cost, not values)") {
    val ev = graft.Tables.events(spark, dir)
    val cols = Seq(col("event_id") -> "id_med", col("user_id") -> "u_med", col("value") -> "v_med")
    val b = 8192
    val multi = HistQuantiles.multiCut(ev, cols, 0.5, b).head()
    cols.zipWithIndex.foreach { case ((c, name), i) =>
      val solo = HistQuantiles.cut(ev, c, 0.5, b, name).head().getDouble(0)
      assert(multi.getDouble(i) == solo, name)
    }
    // per-column NULL handling: a column that is entirely NULL yields a
    // NULL median without disturbing its neighbors
    import spark.implicits._
    val mixed = Seq((1.0, Option.empty[Double]), (3.0, None), (5.0, None))
      .toDF("a", "borked")
    val r = HistQuantiles.multiCut(mixed, Seq(col("a") -> "am", col("borked") -> "bm"), 0.5, 64)
      .head()
    val aSolo = HistQuantiles.cut(mixed, col("a"), 0.5, 64, "am").head().getDouble(0)
    assert(r.getDouble(0) == aSolo && r.isNullAt(1))
  }

  test("exactCutFixed/weightedCutFixed == driver-loop forms, with a fixed data-independent job count") {
    val rng = new scala.util.Random(7)
    val xs = Seq.fill(1500)(rng.nextInt(200).toDouble + rng.nextDouble())
    val df = xs.toDF("x").repartition(6)
    for (p <- Seq(0.25, 0.5, 0.95)) {
      val loop = HistQuantiles.exactCut(df, col("x"), p).head()
      val fixed = HistQuantiles.exactCutFixed(df, col("x"), p, rounds = 2).head()
      assert(fixed.getDouble(0) == loop.getDouble(0) && fixed.getLong(1) == loop.getLong(1), s"p=$p")
    }
    val wdf = xs.map(x => (x, (x % 7) + 1.0)).toDF("x", "w")
    val wLoop = HistQuantiles.weightedCut(wdf, col("x"), col("w")).head()
    val wFixed = HistQuantiles.weightedCutFixed(wdf, col("x"), col("w")).head()
    assert(wFixed.getDouble(0) == wLoop.getDouble(0) && wFixed.getLong(1) == wLoop.getLong(1))
    // the fixed form's pass count must not depend on the data: count
    // Spark jobs for an adversarially tight value cluster (which makes
    // the driver loop iterate) — build + execute stays under a small
    // constant bound tied to rounds, not to value distribution
    // job-count DATA-INDEPENDENCE: the fixed form runs the same number
    // of jobs whether the values are benign or adversarially clustered
    // (the driver-loop form's pass count varies with the data — that is
    // exactly what this form removes). Counters are scoped to a job
    // group because the suite shares one session.
    val tight = (1 to 400).map(i => 1.0 + i * 1e-13).toDF("x")
    val benign = (1 to 400).map(i => i * 10.0).toDF("x")
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val counter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(j.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null && g.startsWith("hq-probe-"))
          counts.merge(g, 1, (a, b) => a + b)
      }
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      def probe(tag: String, df: org.apache.spark.sql.DataFrame): Double = {
        spark.sparkContext.setJobGroup(s"hq-probe-$tag", tag)
        try HistQuantiles.exactCutFixed(df, col("x"), 0.5, nBuckets = 16, rounds = 2)
          .head().getDouble(0)
        finally spark.sparkContext.clearJobGroup()
      }
      val vBenign = probe("benign", benign)
      val vTight = probe("tight", tight)
      Thread.sleep(1000) // let queued listener events drain
      assert(vTight == (1.0 + 200 * 1e-13))
      assert(vBenign == benign.as[Double].collect().sorted.apply(199))
      val (jb, jt) = (counts.get("hq-probe-benign"), counts.get("hq-probe-tight"))
      assert(jb != null && jt != null && math.abs(jb - jt) <= 2,
        s"benign=$jb tight=$jt — fixed form's job count must not depend on the data")
      assert(jt <= 30, s"jobs=$jt — even with AQE stage jobs this should stay small")
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("rolling 7-day median lands within one bucket width of the exact per-window median") {
    val got = graft.analytics.StatsOps.rollingMedianValue(spark, dir)
      .select(col("day"), col("med7"), col("n_window"))
      .as[(String, Double, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    // brute-force: exact trailing-window order statistic per day
    val ev = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("ts").cast("date").cast("string"), col("value"))
      .as[(String, Double)].collect()
    val byDay = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val all = ev.map(_._2)
    val width = (all.max - all.min) / graft.analytics.StatsOps.MadBuckets
    got.foreach { case (day, med7, n) =>
      val d = java.time.LocalDate.parse(day, fmt)
      val win = (0 to 6).flatMap(o => byDay.getOrElse(d.minusDays(o).toString, Array.empty[Double]))
      assert(win.size == n, s"$day window size $n vs ${win.size}")
      val exact = win.sorted.apply(math.ceil(0.5 * win.size).toInt - 1)
      assert(math.abs(med7 - exact) <= width + 1e-6,
        s"$day med7=$med7 exact=$exact width=$width")
    }
  }
}
