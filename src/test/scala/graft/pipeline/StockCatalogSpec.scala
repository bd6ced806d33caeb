package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture invariants behind the stock_* oracle gates — the claims
  * the DuckDB hash compare can't see on its own: the dirty-input
  * contract is actually exercised, the keep-latest dedupe picks the
  * later ingest's values, the bin boundaries flow into the dim, and
  * the U3 fallback path works. (Value-level equality with the
  * reference SQL semantics is the driver's CORRECTNESS gate.) */
class StockCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val raw = StockCatalog.rawStock(spark, dir)
  private lazy val stg = StockPipeline.stgMostActives(raw)
  private lazy val dim = StockPipeline.dimEntity(stg)
  private lazy val fct = StockPipeline.fctObservations(stg)
  private lazy val obs = StockPipeline.observationsWithEntity(fct, dim)

  test("stgSnapshot (above-budget parquet materialization) is value-identical to the stg plan") {
    // the dispatch itself keys on entity count; exercise the snapshot
    // path directly on the fixture and pin round-trip equality — the
    // decade probes then only change WHERE stg lives, never its rows
    val snap = StockCatalog.stgSnapshot(spark, dir)
    assert(snap.columns.toSeq == stg.columns.toSeq)
    assert(snap.collect().map(_.toString).sorted.toSeq ==
      stg.collect().map(_.toString).sorted.toSeq)
  }

  test("raw fixture exercises every dirty-input path of the scraper contract") {
    assert(raw.filter(col("price") === "N/A").count() > 0, "unparseable price")
    assert(raw.filter(col("price") === "").count() > 0, "empty price")
    assert(raw.filter(col("volume") === "1.2.3").count() > 0, "unparseable volume")
    assert(raw.filter(col("avg_volume_3m") === " ").count() > 0, "whitespace-only")
    assert(raw.filter(col("market_cap") === "").count() > 0, "NULL market cap")
    assert(raw.filter(col("location") === "").count() > 0, "empty location")
    assert(raw.filter(col("entity_name").startsWith("  ")).count() > 0, "padded names")
    // duplicate scrape keys with strictly later ingest exist
    val dups = raw.groupBy(col("symbol"), col("scraped_at"))
      .agg(count(lit(1)).as("n"), countDistinct(col("_ingested_at")).as("n_ing"))
      .filter(col("n") > 1)
    assert(dups.count() > 0)
    assert(dups.filter(col("n") =!= col("n_ing")).count() == 0,
      "every duplicate group must have strictly ordered _ingested_at")
  }

  test("stg dedupes to unique observation_sk and keeps the LATER ingest's values") {
    assert(stg.count() ==
      stg.select(col("observation_sk")).distinct().count())
    // (k=5, b=0) has a dup: original price pi=(5*997)%2000=985 → 246.25,
    // dup (ingested an hour later) pi=(985+499)=1484 → 371.0 — the
    // survivor must carry the dup's price
    val p = stg.filter(col("symbol") === "SYM5" &&
        col("observation_date") === "2024-01-10")
      .select(col("price")).as[Double].head()
    assert(p == 371.0)
  }

  test("dim surfaces the right-closed bin boundaries from the LAST batch") {
    val cats = dim.filter(col("symbol").isin("SYM31", "SYM37"))
      .select(col("symbol"), col("market_cap_category")).as[(String, String)]
      .collect().toMap
    assert(cats("SYM31") == "Small") // exactly 2e9 → Small (right-closed)
    assert(cats("SYM37") == "Mid")   // exactly 1e10 → Mid
    // NULL caps land in Unknown
    assert(dim.filter(col("market_cap_category") === "Unknown").count() > 0)
  }

  test("fixture market caps are globally unique (top-k sets can never tie)") {
    val caps = fct.filter(col("market_cap").isNotNull).select(col("market_cap"))
    assert(caps.count() == caps.distinct().count())
  }

  test("q4 scalable form: HLL entity estimates within the ~1.04/sqrt(64) band of exact") {
    val exact = StockPipeline.q4GeoBreakdown(fct, dim)
      .select(col("location"), col("n_entities")).as[(String, Long)].collect().toMap
    val est = StockPipeline.q4GeoBreakdownScalable(fct, dim, m = 64)
      .select(col("location"), col("n_entities_est")).as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (loc, e) =>
      val x = exact(loc)
      assert(math.abs(e - x) <= math.max(3, 0.45 * x),
        s"$loc: est $e vs exact $x — outside 3.5 sigma of the m=64 error band")
    }
  }

  test("kpisWithFallback: empty filter result falls back to the full dataset") {
    val empty = StockPipeline.applyFilters(obs,
      category = Some("NO-SUCH-CATEGORY"), metric = "market_cap")
    val (tot, n, _) = StockPipeline.kpisWithFallback(empty, obs)
    val (fullTot, fullN, _) = StockPipeline.kpis(obs)
    assert(n == fullN && tot == fullTot && n > 0)
  }

  test("streamed incremental dim == batch dim rebuild (same rows, same values)") {
    val streamed = StockCatalog.stockStreamDim(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = StockCatalog.stockDimEntity(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("qualitySuite is clean on the fixture (all 13 dbt checks pass)") {
    assert(StockPipeline.qualitySuite(stg, dim, fct) == Map.empty)
  }

  test("summaryText renders the app's exact sentence on the displayed rows") {
    val shown = StockPipeline.applyFilters(obs,
      metric = "market_cap", minThreshold = 0.0, limit = Some(1))
    val text = StockPipeline.summaryText(shown)
    assert(text.startsWith("Top result is SYM37. "))
    assert(text.contains("Average price across displayed rows is 457.00."))
    // empty input takes the no-rows message, not a NaN sentence
    assert(StockPipeline.summaryText(shown.filter(lit(false))) ==
      "No rows matched the selected filters.")
  }
}
