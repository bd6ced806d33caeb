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

  private val srcUrl = "https://example.com/most-actives"

  /** Raw rows in the scraper's canonical 12-field vocabulary (all
    * strings; includes a duplicated observation, a dirty numeric, and
    * an empty location). */
  private def rawFixture(): DataFrame = Seq(
    // symbol, name, cat, loc, exch, ccy, price, mcap, volume, avg3m, url, scraped_at, _ing
    ("AAA", "Alpha", "Tech", "US", "NYSE", "USD", "10.5", "5000000000", "1000", "900", srcUrl, t1, "2024-03-01 10:01:00"),
    ("AAA", "Alpha", "Tech", "US", "NYSE", "USD", "10.5", "5000000000", "1000", "900", srcUrl, t1, "2024-03-01 10:02:00"), // dup obs, later ingest wins
    ("BBB", "Beta", "Fin", "", "NYSE", "USD", "20.0", "1000000000", "garbage", "800", srcUrl, t1, "2024-03-01 10:01:00"), // dirty volume, empty loc
    ("CCC", "Gamma", "Tech", "UK", "LSE", "GBP", "30.0", "20000000000", "9000", "850", srcUrl, t1, "2024-03-01 10:01:00"),
    ("AAA", "Alpha", "Tech", "US", "NYSE", "USD", "11.0", "5100000000", "1100", "900", srcUrl, t2, "2024-03-02 10:01:00"),
    ("CCC", "Gamma", "Tech", "UK", "LSE", "GBP", "29.0", "19000000000", "100000", "850", srcUrl, t2, "2024-03-02 10:01:00"))
    .toDF(StockPipeline.rawColumns :+ "_ing": _*)
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
    val base = StockPipeline.observationsWithEntity(fct, dim)
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

  test("batched suiteCounts equals the per-check definitional map, healthy and corrupted") {
    // the r16 job batching (per-frame not_null tests in one aggregate
    // pass) must be count-identical to evaluating qualityChecks one
    // function at a time — on a healthy warehouse AND under corruption
    // that trips null, unique, and relationship checks at once
    def perCheck(s: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame,
        f: org.apache.spark.sql.DataFrame): Map[String, Long] =
      StockPipeline.qualityChecks(s, d, f).map { case (n, fn) => n -> fn() }
    assert(StockPipeline.suiteCounts(stg, dim, fct) == perCheck(stg, dim, fct))
    val badFct = fct.unionByName(
      fct.limit(1).withColumn("entity_sk", lit("deadbeef")))
      .unionByName(fct.limit(1).withColumn("observation_date",
        lit(null).cast(fct.schema("observation_date").dataType)))
    val badDim = dim.unionByName(dim.limit(1).withColumn("symbol", lit(null: String)))
    assert(StockPipeline.suiteCounts(stg, badDim, badFct) == perCheck(stg, badDim, badFct))
  }

  test("normalizeQuotes applies the scraper's fallback chains and coercions") {
    // raw Yahoo-quote shapes: full row, fallback-to-shortName, fallback-to-symbol
    // with empty strings (Python falsy), unparseable price, infinite price
    val quotes = Seq(
      ("AAPL", "Apple Inc.", "Apple", "Equity", "EQUITY", "US", "NasdaqGS", "NMS", "USD", "123.456", "3000000000000", "50000000", "45000000"),
      ("BBBX", null, "Beta Corp", null, "EQUITY", null, null, "NYQ", "USD", "7.5", "1000000", "100", "90"),
      ("CCCX", "", "", "", "", "", "", "CCC-EX", null, "garbage", null, "12.9", ""),
      ("DDDX", "Delta", null, "Equity", null, "GB", "LSE Intl", "LSE", "GBP", "inf", "5", "", "10"))
      .toDF("symbol", "longName", "shortName", "typeDisp", "quoteType", "region",
        "fullExchangeName", "exchange", "currency", "regularMarketPrice",
        "marketCap", "regularMarketVolume", "averageDailyVolume3Month")
    val out = StockPipeline.normalizeQuotes(quotes,
      scrapedAt = lit("2024-03-01T10:00:00+00:00"), sourceUrl = lit(srcUrl))
    assert(out.columns.toSeq == StockPipeline.rawColumns)
    val rows = out.collect().map(r => r.getAs[String]("symbol") -> r).toMap
    val a = rows("AAPL")
    assert(a.getAs[String]("entity_name") == "Apple Inc.")
    assert(a.getAs[String]("category") == "Equity")      // typeDisp wins
    assert(a.getAs[Double]("price") == 123.456)
    assert(a.getAs[Long]("market_cap") == 3000000000000L)
    assert(a.getAs[String]("source_url") == srcUrl)
    val b = rows("BBBX")
    assert(b.getAs[String]("entity_name") == "Beta Corp") // longName null -> shortName
    assert(b.getAs[String]("category") == "EQUITY")       // typeDisp null -> quoteType
    assert(b.getAs[String]("exchange") == "NYQ")          // fullExchangeName null -> exchange
    val c = rows("CCCX")
    assert(c.getAs[String]("entity_name") == "CCCX")      // '' falsy -> '' falsy -> symbol
    assert(c.getAs[String]("category") == "Unknown")      // both '' -> Unknown
    assert(c.getAs[String]("location") == "Unknown")      // '' -> Unknown
    assert(c.getAs[String]("exchange") == "CCC-EX")       // '' -> raw exchange
    assert(c.getAs[Any]("price") == null)                 // garbage -> null
    assert(c.getAs[Long]("volume") == 12L)                // int(float("12.9")) truncates
    assert(c.getAs[Any]("avg_volume_3m") == null)         // '' -> null
    val d = rows("DDDX")
    assert(d.getAs[Any]("price") == null)                 // inf parses, non-finite -> null
    assert(d.getAs[Any]("volume") == null)
  }

  test("summaryText renders the app's exact format, including the empty case") {
    val base = StockPipeline.observationsWithEntity(fct, dim)
    val displayed = StockPipeline.applyFilters(base, metric = "volume", limit = Some(20))
    // volumes 100000, 9000, 1100, 1000, null; prices 29.0, 30.0, 11.0, 10.5, 20.0
    // avg_price = 100.5/5 = 20.1 -> "20.10"; avg_volume = 111100/4 = 27775
    assert(StockPipeline.summaryText(displayed) ==
      "Top result is CCC. Average price across displayed rows is 20.10. " +
        "Average volume across displayed rows is 27,775.")
    assert(StockPipeline.summaryText(displayed.filter($"symbol" === "NOPE")) ==
      "No rows matched the selected filters.")
  }

  test("fct carries the reference's exact column set") {
    assert(fct.columns.toSeq == Seq("observation_sk", "entity_sk", "symbol",
      "observation_date", "scraped_at", "price", "market_cap", "volume",
      "avg_volume_3m", "source_url"))
  }

  test("dimEntityScalable (agg form) is bit-equal to dimEntity (window form)") {
    val win = StockPipeline.dimEntity(stg).collect().toSet
    val agg = StockPipeline.dimEntityScalable(stg).collect().toSet
    assert(win == agg)
  }

  test("dimEntityScalable handles a NULL scraped_at like desc_nulls_last (non-null wins)") {
    // hand-built stg-shaped slice: one entity with a NULL-timestamp
    // observation and a real one — both forms must keep the real one;
    // an all-NULL entity must still yield exactly one row
    val stgLike = Seq(
      ("E1", "SYMA", "A Corp", "NYSE", "Tech", "US", Some(5000000000L),
        Some(java.sql.Timestamp.valueOf("2024-01-12 09:30:00"))),
      ("E1", "SYMA", "A Corp", "NYSE", "Tech", "US", Some(4000000000L), None),
      ("E2", "SYMB", "B Corp", "NASDAQ", "Retail", "FRANCE", None, None))
      .toDF("entity_sk", "symbol", "entity_name", "exchange", "category",
        "location", "market_cap_opt", "scraped_at_opt")
      .select($"entity_sk", $"symbol", $"entity_name", $"exchange", $"category",
        $"location", $"market_cap_opt".as("market_cap"), $"scraped_at_opt".as("scraped_at"))
    val win = StockPipeline.dimEntity(stgLike).collect().toSet
    val agg = StockPipeline.dimEntityScalable(stgLike).collect().toSet
    assert(win == agg)
    assert(win.size == 2)
    val e1 = win.find(_.getString(0) == "E1").get
    assert(!e1.isNullAt(7)) // the non-null scraped_at row won
  }

  test("pipeline is idempotent: re-staging the staged data is stable") {
    // running staging twice over the same raw yields identical keys
    val stg2 = StockPipeline.stgMostActives(rawFixture())
    assert(stg.select($"observation_sk").collect().toSet
      == stg2.select($"observation_sk").collect().toSet)
  }
}
