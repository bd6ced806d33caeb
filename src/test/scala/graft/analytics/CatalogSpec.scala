package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** Catalog-level invariants over the sf0.001 harness data: every
  * declared query runs, returns rows, and satisfies its structural
  * contract (limits, orderings, schema names match the oracle). */
class CatalogSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every catalog query runs on sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle, every oracle has a query") {
    // since r6 (xxHash64 replayed in DuckDB HUGEINT SQL) every entry —
    // including dedup_minhash_fast — carries a full hash-gated oracle
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("q1 returns exactly 10 brands ordered by revenue desc") {
    val rows = Queries.q1TopBrands(spark, dir).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sorted.reverse)
  }

  test("q5 respects its conjunctive thresholds and limit") {
    val rows = Queries.q5RiskWatchlist(spark, dir).collect()
    assert(rows.length <= 50)
    assert(rows.forall(r => r.getAs[Double]("spike_ratio") >= 1.5
      && r.getAs[Double]("momentum") <= 0))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("benford screen: 9-digit spine, counts reconcile, expected mass sums to n") {
    val rows = StatsOps.benfordTotalprice(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val n = rows.map(_.getAs[Long]("n_obs")).sum
    assert(n > 0)
    // Σ expected = n · Σ log10(1+1/d) = n exactly (telescoping), up to
    // 9 micro-roundings
    val expSum = rows.map(_.getAs[Long]("expected_micro")).sum
    assert(math.abs(expSum - n * 1000000L) <= 9, s"expSum=$expSum n=$n")
    assert(rows.forall(_.getAs[Long]("chi2_micro") >= 0L))
  }

  test("cusum scan: one row per day, shift flag marks exactly the |cusum| peak") {
    val rows = StatsOps.cusumValueShift(spark, dir).collect()
    assert(rows.length == 30) // the harness window is Jan 2024
    assert(rows.map(_.getAs[String]("day")).toSeq == rows.map(_.getAs[String]("day")).toSeq.sorted)
    val mx = rows.map(r => math.abs(r.getAs[Long]("cusum_micro"))).max
    rows.foreach { r =>
      val atPeak = math.abs(r.getAs[Long]("cusum_micro")) == mx
      // quantized |cusum| can tie off-peak only within 1 micro-unit of
      // the true max; the flag follows the unquantized statistic
      if (r.getAs[Int]("is_shift") == 1) assert(math.abs(r.getAs[Long]("cusum_micro")) >= mx - 1)
      else assert(!atPeak || rows.count(_.getAs[Int]("is_shift") == 1) >= 1)
    }
    assert(rows.map(_.getAs[Int]("is_shift")).sum >= 1)
  }
}
