package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §5 end-to-end plan: synthetic multi-batch raw data (two
  * scrape timestamps, duplicate rows, dirty numerics) through the
  * full staging → marts → Q1..Q5 → quality run against hand-computed
  * golden outputs. */
class StockPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = "2024-03-01 10:00:00"
  private val t2 = "2024-03-02 10:00:00"

  /** Raw rows as the scraper would emit them (all strings; includes a
    * duplicated observation, a dirty numeric, and a NULL location). */
  private def rawFixture(): DataFrame = Seq(
    // symbol, name, exch, price, chg, pct, volume, avg3m, mcap, cat, loc, scraped_at, _ing
    ("AAA", "Alpha", "NYSE", "10.5", "0.5", "5.0", "1000", "900", "5000000000", "Tech", "US", t1, "2024-03-01 10:01:00"),
    ("AAA", "Alpha", "NYSE", "10.5", "0.5", "5.0", "1000", "900", "5000000000", "Tech", "US", t1, "2024-03-01 10:02:00"), // dup obs, later ingest wins
    ("BBB", "Beta", "NYSE", "20.0", "-1.0", "-4.8", "garbage", "800", "1000000000", "Fin", "", t1, "2024-03-01 10:01:00"), // dirty volume, empty loc
    ("CCC", "Gamma", "LSE", "30.0", "2.0", "7.1", "9000", "850", "20000000000", "Tech", "UK", t1, "2024-03-01 10:01:00"),
    ("AAA", "Alpha", "NYSE", "11.0", "0.5", "4.8", "1100", "900", "5100000000", "Tech", "US", t2, "2024-03-02 10:01:00"),
    ("CCC", "Gamma", "LSE", "29.0", "-1.0", "-3.3", "100000", "850", "19000000000", "Tech", "UK", t2, "2024-03-02 10:01:00"))
    .toDF("symbol", "entity_name", "exchange", "price", "change", "percent_change",
      "volume", "avg_volume_3m", "market_cap", "category", "location", "scraped_at", "_ing")
    .withColumn("_ingested_at", $"_ing".cast("timestamp")).drop("_ing")

  private lazy val stg = StockPipeline.stgMostActives(rawFixture())
  private lazy val dim = StockPipeline.dimEntity(stg)
  private lazy val fct = StockPipeline.fctObservations(stg)

  test("staging dedupes the repeated observation and coerces dirty values") {
    assert(stg.count() == 5) // 6 raw - 1 dup
    val bbb = stg.filter($"symbol" === "BBB").head()
    assert(bbb.getAs[Any]("volume") == null)       // garbage -> NULL
    assert(bbb.getAs[String]("location") == "Unknown") // empty -> Unknown
    // keys are deterministic: same entity across batches = same entity_sk
    assert(stg.filter($"symbol" === "AAA").select($"entity_sk").distinct().count() == 1)
    // different scrape ts = different observation_sk
    assert(stg.filter($"symbol" === "AAA").select($"observation_sk").distinct().count() == 2)
  }

  test("dim keeps exactly the latest row per entity with pd.cut market-cap bins") {
    assert(dim.count() == 3)
    val aaa = dim.filter($"symbol" === "AAA").head()
    assert(aaa.getAs[java.sql.Timestamp]("last_seen_at").toString.startsWith("2024-03-02"))
    assert(aaa.getAs[String]("market_cap_category") == "Mid")   // 5.1e9 in (2e9, 1e10]
    assert(dim.filter($"symbol" === "BBB").head().getAs[String]("market_cap_category") == "Small") // exactly 1e9 <= 2e9
    assert(dim.filter($"symbol" === "CCC").head().getAs[String]("market_cap_category") == "Large") // 1.9e10 > 1e10
  }

  test("q1 ranks by latest market cap") {
    val out = StockPipeline.q1TopMarketCap(fct, dim, k = 10)
      .select($"symbol", $"latest_market_cap").as[(String, Long)].collect().toSeq
    assert(out == Seq(("CCC", 20000000000L), ("AAA", 5100000000L), ("BBB", 1000000000L)))
  }

  test("q2 aggregates per observation date") {
    val out = StockPipeline.q2DailyTrend(fct)
      .select($"observation_date".cast("string"), $"n_entities").as[(String, Long)]
      .collect().toSeq
    assert(out == Seq(("2024-03-01", 3L), ("2024-03-02", 2L)))
  }

  test("q3 flags the volume outlier at a permissive threshold, NULL volumes excluded") {
    val out = StockPipeline.q3VolumeOutliers(fct, dim, zMin = 1.0)
      .select($"symbol").as[String].collect().toSeq
    assert(out == Seq("CCC")) // 100000 vs the rest
  }

  test("q4 rolls up by location with Unknown bucket") {
    val out = StockPipeline.q4GeoBreakdown(fct, dim)
      .select($"location", $"n_entities", $"total_volume")
      .as[(String, Long, Option[Long])].collect()
    assert(out.map(_._1).toSet == Set("US", "UK", "Unknown"))
    assert(out.find(_._1 == "UK").get._3.contains(109000L))
    assert(out.find(_._1 == "Unknown").get._3.isEmpty) // only the NULL-volume row
  }

  test("q5 computes guarded spike/momentum and respects thresholds") {
    // CCC day2: volume 100000 vs avg(9000, 100000)=54500 -> spike 1.83; price down -> momentum via lag(7) is NULL (short series)
    val out = StockPipeline.q5RiskWatchlist(fct, dim, spikeMin = 1.5, momentumMax = 0.0)
    assert(out.count() == 0) // lag(7) NULL => filtered (guarded, no crash)
  }

  test("app layer: filters, shocks, KPIs") {
    val base = StockPipeline.fctObservations(stg).join(dim, "entity_sk")
    val filtered = StockPipeline.applyFilters(base, category = Some("Tech"),
      metric = "market_cap", minThreshold = 0, limit = Some(20))
    assert(filtered.select($"symbol").as[String].collect().toSet == Set("AAA", "CCC"))
    val shocks = StockPipeline.liquidityShocks(base, zMin = 1.0)
    assert(shocks.select($"symbol").as[String].collect().toSeq == Seq("CCC"))
    val (totalVolume, nRows, top5) = StockPipeline.kpis(base)
    assert(totalVolume == 111100L && nRows == 5)
    assert(top5.select($"symbol").as[String].collect().head == "CCC")
    // U3 fallback: empty filter result -> KPIs over the full dataset
    val none = StockPipeline.applyFilters(base, category = Some("NoSuchCategory"))
    val (fbVolume, fbRows, _) = StockPipeline.kpisWithFallback(none, base)
    assert(fbVolume == 111100L && fbRows == 5)
  }

  test("quality suite passes on the healthy warehouse and catches injected corruption") {
    assert(StockPipeline.qualitySuite(stg, dim, fct) == Map.empty)
    // corrupt: fact row referencing a missing entity
    val badFct = fct.unionByName(fct.limit(1).withColumn("entity_sk", lit("deadbeef")))
    val report = StockPipeline.qualitySuite(stg, dim, badFct)
    assert(report.contains("fct_entity_sk_relationship"))
    assert(report.contains("fct_observation_sk_unique"))
  }

  test("pipeline is idempotent: re-staging the staged data is stable") {
    // running staging twice over the same raw yields identical keys
    val stg2 = StockPipeline.stgMostActives(rawFixture())
    assert(stg.select($"observation_sk").collect().toSet
      == stg2.select($"observation_sk").collect().toSet)
  }
}
