package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols
import graft.quality.DataQuality

/** The reference's complete stock "most actives" pipeline — bronze →
  * staging → dim/fact marts → analytics (Q1–Q5) → app queries
  * (U1–U3) → quality suite — as pure DataFrame functions over the
  * reference's own column vocabulary, so a user of the reference can
  * run their exact workload on this engine.
  *
  * Reference citations (/root/reference):
  *  - raw 12-column row: scraper/scrape.py:102-120
  *  - staging casts/keys/dedupe: dbt_project/models/stg_most_actives.sql:5-53,
  *    sql/02_load_data.sql:80-112
  *  - dim keep-latest: dbt_project/models/dim_entity.sql:15-31
  *  - fact projection: dbt_project/models/fct_observations.sql:5-30
  *  - Q1–Q5: sql/03_analytics_queries.sql:6-148
  *  - app filters/shocks/KPIs: app/streamlit_app.py:167-430
  *  - dbt tests: dbt_project/models/schema.yml:12-76
  *
  * Decisions the survey called out, applied here: ONE canonical
  * observation-hash input (the dbt formulation: entity fields +
  * canonically formatted timestamp, SURVEY §1.1); `desc_nulls_last`
  * everywhere (SURVEY §2.5 W2); analytics on double (SURVEY §7.4 #3);
  * dim stays broadcastable (SURVEY §7.5).
  */
object StockPipeline {

  /** Bronze payload columns — the scraper's canonical 12-field row,
    * exactly as normalize_row emits it (ref scraper/scrape.py:102-120)
    * and the raw DDL declares it (ref sql/01_create_tables.sql:14-32). */
  val rawColumns: Seq[String] = Seq(
    "symbol", "entity_name", "category", "location", "exchange", "currency",
    "price", "market_cap", "volume", "avg_volume_3m", "source_url", "scraped_at")

  private val tsFmt = "yyyy-MM-dd HH:mm:ss"

  /** Python falsy-string fallback: `a or b` skips None AND '' (but not
    * whitespace — the scraper does not trim here). */
  private def orEmpty(c: Column): Column = nullif(c, lit(""))

  /** Python to_float (ref scrape.py:80-89): None/''/unparseable → NULL,
    * and non-finite parses (inf/nan) → NULL. */
  private def toFloatPy(c: Column): Column = {
    val d = Cols.tryDouble(c)
    when(isnan(d) || d === Double.PositiveInfinity || d === Double.NegativeInfinity,
      lit(null)).otherwise(d)
  }

  /** Python to_int (ref scrape.py:92-98): int(float(v)) — parse as
    * float, truncate toward zero; None/''/unparseable → NULL. */
  private def toIntPy(c: Column): Column =
    Cols.tryDouble(c).try_cast("long")

  /** The scraper's normalize_row projection (ref scrape.py:102-120):
    * coalesce fallback chains from raw Yahoo-quote fields — e.g.
    * longName → shortName → symbol — into the canonical
    * [[rawColumns]] bronze row. Input: one row per raw quote with the
    * quote-dict field names (e.g. from `spark.read.json` over captured
    * API payloads); missing fields should surface as NULL columns.
    * `scrapedAt` is the run stamp; `sourceUrl` the page constant. */
  def normalizeQuotes(rawQuotes: DataFrame, scrapedAt: Column, sourceUrl: Column): DataFrame =
    rawQuotes.select(
      col("symbol").as("symbol"),
      coalesce(orEmpty(col("longName")), orEmpty(col("shortName")), col("symbol"))
        .as("entity_name"),
      coalesce(orEmpty(col("typeDisp")), orEmpty(col("quoteType")), lit("Unknown"))
        .as("category"),
      coalesce(orEmpty(col("region")), lit("Unknown")).as("location"),
      coalesce(orEmpty(col("fullExchangeName")), col("exchange")).as("exchange"),
      col("currency").cast("string").as("currency"),
      toFloatPy(col("regularMarketPrice")).as("price"),
      toIntPy(col("marketCap")).as("market_cap"),
      toIntPy(col("regularMarketVolume")).as("volume"),
      toIntPy(col("averageDailyVolume3Month")).as("avg_volume_3m"),
      sourceUrl.cast("string").as("source_url"),
      scrapedAt.cast("string").as("scraped_at"))

  /** M1 — staging: clean strings, TRY-typed numerics, content-hash
    * surrogate keys, keep-latest dedupe per observation. Input may
    * carry `_ingested_at` (bronze metadata); absent → load time. */
  def stgMostActives(raw: DataFrame): DataFrame = {
    val withMeta =
      if (raw.columns.contains("_ingested_at")) raw
      else raw.withColumn("_ingested_at", current_timestamp())
    val ts = Cols.tryTimestamp(trim(col("scraped_at")))
    // the dedupe window shuffles the short pre-digest KEY MATERIAL
    // (grouping by it ≡ grouping by its sha256 — Cols.keyMaterial) and
    // both 64-char hex digests are computed on the SURVIVORS only:
    // value-identical output (oracle replays the same hashes; the
    // entity_sk recompute from CLEANED columns equals the raw-column
    // digest because hashKey itself trims and ''-coalesces), but the
    // shuffle drops ~128 incompressible hex bytes per row — at the
    // synthetic sf100 that is ~26 GB off the stg build's dominant
    // shuffle, the measured scratch bound of the stock family's
    // third decade (SCALE.md).
    val stg = withMeta.select(
      Cols.cleanString(col("symbol")).as("symbol"),
      Cols.cleanString(col("entity_name")).as("entity_name"),
      Cols.cleanString(col("exchange")).as("exchange"),
      Cols.cleanString(col("currency")).as("currency"),
      Cols.tryDecimal(trim(col("price")), 18, 4).cast("double").as("price"),
      Cols.tryNumber(trim(col("volume"))).cast("long").as("volume"),
      Cols.tryNumber(trim(col("avg_volume_3m"))).cast("long").as("avg_volume_3m"),
      Cols.tryNumber(trim(col("market_cap"))).cast("long").as("market_cap"),
      coalesce(Cols.cleanString(col("category")), lit("Unknown")).as("category"),
      coalesce(Cols.cleanString(col("location")), lit("Unknown")).as("location"),
      col("source_url"),
      ts.as("scraped_at"),
      to_date(ts).as("observation_date"),
      // canonical hash input: dbt formulation — parsed ts reformatted
      Cols.keyMaterial(col("symbol"), col("entity_name"), col("exchange"),
        date_format(ts, tsFmt)).as("_obs_key"),
      col("_ingested_at"))
    val w = Window.partitionBy(col("_obs_key"))
      .orderBy(col("_ingested_at").desc_nulls_last)
    stg.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("entity_sk",
        Cols.hashKey(col("symbol"), col("entity_name"), col("exchange")))
      .withColumn("observation_sk", sha2(col("_obs_key"), 256))
      .drop("rn", "_ingested_at", "_obs_key")
      .select(stgColumns.map(col): _*)
  }

  /** Canonical stg column order — the contract every stg consumer
    * (and the parquet snapshot round trip, StockCatalog.stgSnapshot)
    * relies on. */
  val stgColumns: Seq[String] = Seq(
    "symbol", "entity_name", "exchange", "currency", "price", "volume",
    "avg_volume_3m", "market_cap", "category", "location", "source_url",
    "scraped_at", "observation_date", "entity_sk", "observation_sk")

  /** M2 — dim_entity: latest observation per entity (broadcast-sized
    * at any fact scale: one row per listed entity). */
  def dimEntity(stg: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("entity_sk"))
      .orderBy(col("scraped_at").desc_nulls_last)
    stg.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("entity_sk"), col("symbol"), col("entity_name"), col("exchange"),
        col("category"), col("location"),
        Cols.marketCapCategory(col("market_cap").cast("double")).as("market_cap_category"),
        col("scraped_at").as("last_seen_at"))
  }

  /** [[dimEntity]]'s PARTIAL-AGGREGABLE twin: keep-latest as ONE
    * max-of-struct aggregate instead of a window rank. Value-identical
    * output (StockPipelineSpec pins bit-equality on the fixture AND
    * on a null-scraped_at edge): struct comparison is lexicographic
    * with null fields FIRST, so max() lands on the non-null-latest row
    * exactly like `desc_nulls_last` rn=1 — and on a scraped_at tie it
    * picks the lexicographically-greatest remaining tuple, which is
    * DETERMINISTIC where row_number's tie pick is not.
    *
    * Why it exists: the window form shuffles EVERY staging row to its
    * entity's partition before ranking — O(facts) sort spill, ~35 GB
    * at the synthetic sf100 and the measured cause of the stock
    * family's third-decade ENOSPC (SCALE.md) — while this form
    * partial-aggregates map-side, so the shuffle carries ~one row per
    * entity per input partition: O(entities), the actual dim size,
    * regardless of fact scale. This is the keep-latest shape a 100 TB
    * dim maintenance job ships. */
  def dimEntityScalable(stg: DataFrame): DataFrame = {
    // argmax-by-join-back, NOT a whole-row aggregate: a direct
    // max(struct(...)) has no fixed-size buffer, so HashAggregate
    // degenerates to a sort-based fallback that re-sorts O(facts)
    // rows — measured as a ~26 GB spill at the synthetic sf100, the
    // same cost the window form pays (SCALE.md). Instead: (1) a THIN
    // max-timestamp hash aggregate (fixed-size buffer, true map-side
    // combine — the shuffle carries key+ts only); (2) the O(entities)
    // result broadcast back onto staging as a null-safe map-side
    // filter (the dim IS broadcast-sized at any fact scale — the
    // family's standing premise); (3) the deterministic
    // lexicographic-max tiebreak runs over the ~O(entities) surviving
    // rows only.
    val latest = stg.groupBy(col("entity_sk").as("_dim_sk"))
      .agg(max(col("scraped_at")).as("_max_ts"))
    val atLatest = stg.join(broadcast(latest),
      col("entity_sk") === col("_dim_sk") && col("scraped_at") <=> col("_max_ts"))
    val picked = atLatest.groupBy(col("entity_sk"))
      .agg(max(struct(col("scraped_at"), col("symbol"), col("entity_name"),
        col("exchange"), col("category"), col("location"), col("market_cap"))).as("s"))
    picked.select(col("entity_sk"), col("s.symbol").as("symbol"),
      col("s.entity_name").as("entity_name"), col("s.exchange").as("exchange"),
      col("s.category").as("category"), col("s.location").as("location"),
      Cols.marketCapCategory(col("s.market_cap").cast("double")).as("market_cap_category"),
      col("s.scraped_at").as("last_seen_at"))
  }

  /** M3 — fct_observations: pure projection of staging, the
    * reference's exact column set (ref fct_observations.sql:5-30). */
  def fctObservations(stg: DataFrame): DataFrame =
    stg.select(col("observation_sk"), col("entity_sk"), col("symbol"),
      col("observation_date"), col("scraped_at"), col("price"),
      col("market_cap"), col("volume"), col("avg_volume_3m"), col("source_url"))

  /** fct ⋈ dim on entity_sk; the dim's symbol wins (reference queries
    * read d.symbol, ref 03_analytics_queries.sql:8). Public because the
    * app layer (U1–U4) runs over this joined frame. */
  def observationsWithEntity(fct: DataFrame, dim: DataFrame): DataFrame =
    fct.drop("symbol").join(broadcast(dim), "entity_sk")

  private def joined(fct: DataFrame, dim: DataFrame): DataFrame =
    observationsWithEntity(fct, dim)

  /** Q1 — top-k by latest market cap per entity. */
  def q1TopMarketCap(fct: DataFrame, dim: DataFrame, k: Int = 10): DataFrame =
    joined(fct, dim)
      .groupBy(col("symbol"), col("entity_name"), col("category"), col("location"))
      .agg(max(col("market_cap")).as("latest_market_cap"))
      .orderBy(col("latest_market_cap").desc_nulls_last, col("symbol").asc)
      .limit(k)

  /** Q2 — daily trend: avg price/volume + distinct entities per date. */
  def q2DailyTrend(fct: DataFrame): DataFrame =
    fct.groupBy(col("observation_date"))
      .agg(
        avg(col("price")).as("avg_price"),
        avg(col("volume")).as("avg_volume"),
        countDistinct(col("entity_sk")).as("n_entities"))
      .orderBy(col("observation_date").asc)

  /** Q3 — volume z-score outliers, |z| ≥ zMin (global stats via 1-row
    * aggregate + broadcast, never a global window). */
  def q3VolumeOutliers(fct: DataFrame, dim: DataFrame, zMin: Double = 3.0): DataFrame = {
    val nonNull = fct.filter(col("volume").isNotNull)
    val stats = nonNull.agg(
      avg(col("volume").cast("double")).as("mean_volume"),
      stddev(col("volume").cast("double")).as("std_volume"))
    joined(nonNull, dim)
      .crossJoin(broadcast(stats))
      .withColumn("volume_z_score",
        Cols.zScore(col("volume").cast("double"), col("mean_volume"), col("std_volume")))
      .filter(abs(col("volume_z_score")) >= zMin)
      .select(col("symbol"), col("entity_name"), col("observation_date"),
        col("volume"), col("volume_z_score"))
      .orderBy(abs(col("volume_z_score")).desc, col("symbol").asc)
  }

  /** Q4 — geographic rollup on COALESCE'd location. */
  def q4GeoBreakdown(fct: DataFrame, dim: DataFrame): DataFrame =
    joined(fct, dim)
      .groupBy(coalesce(col("location"), lit("Unknown")).as("location"))
      .agg(
        countDistinct(col("entity_sk")).as("n_entities"),
        avg(col("price")).as("avg_price"),
        avg(col("market_cap")).as("avg_market_cap"),
        sum(col("volume")).as("total_volume"))
      .orderBy(col("total_volume").desc_nulls_last, col("location").asc)

  /** Q4 at 100 TB — the same geographic rollup with the distinct-
    * entity count estimated by the engine's portable HLL (m registers
    * per location; exact sums unchanged). The exact form's
    * COUNT(DISTINCT entity_sk) Expands the fact with its 64-byte
    * sha256 keys through the shuffle — measured as the one scratch-
    * bound stock plan at the synthetic sf100 decade (SCALE.md r11) —
    * while this form's distinct state is m registers per location
    * regardless of fact or entity scale. Estimate error is the
    * standard ~1.04/√m (m = 64 → ~13%); sums/averages stay exact. */
  def q4GeoBreakdownScalable(fct: DataFrame, dim: DataFrame, m: Int = 64): DataFrame = {
    val o = joined(fct, dim)
      .withColumn("location", coalesce(col("location"), lit("Unknown")))
    val sums = o.groupBy(col("location"))
      .agg(
        avg(col("price")).as("avg_price"),
        avg(col("market_cap")).as("avg_market_cap"),
        sum(col("volume")).as("total_volume"))
    val est = graft.operators.Sketches.hllDistinctBy(
        o.select(col("location"), col("entity_sk")),
        col("location"), col("entity_sk"), m)
      .select(col("g").as("location"), col("n_est").as("n_entities_est"))
    sums.join(est, Seq("location"))
      .select(col("location"), col("n_entities_est"), col("avg_price"),
        col("avg_market_cap"), col("total_volume"))
      .orderBy(col("total_volume").desc_nulls_last, col("location").asc)
  }

  /** Q5 — risk watchlist: 7-row trailing volume average + LAG(7)
    * price momentum, guarded ratios, conjunctive thresholds, top-k. */
  def q5RiskWatchlist(fct: DataFrame, dim: DataFrame,
      spikeMin: Double = 1.5, momentumMax: Double = 0.0, k: Int = 50): DataFrame = {
    // join-after-reduce: the trailing windows run over the THIN fact
    // frame (key + date + the two metrics) and the dim attributes the
    // OUTPUT needs (d.symbol, d.entity_name — ref reads the dim's,
    // 03_analytics_queries.sql:8) join back AFTER the threshold filter
    // collapses 136M windowed rows to the watchlist candidates.
    // Value-identical to windowing the joined frame (every fct row has
    // a dim match by construction — dim is fct's entity set — and the
    // dim attributes are functions of the join key), but the window
    // shuffle drops the name columns: ~10 GB at the synthetic sf100,
    // where windowing the joined frame was scratch-fatal (SCALE.md).
    val w = Window.partitionBy(col("entity_sk")).orderBy(col("observation_date").asc)
    val flagged = fct
      .select(col("entity_sk"), col("observation_date"), col("price"), col("volume"))
      .withColumn("volume_7d_avg",
        avg(col("volume")).over(w.rowsBetween(-6, Window.currentRow)))
      .withColumn("price_7d_ago", lag(col("price"), 7).over(w))
      .withColumn("volume_spike_ratio",
        Cols.guardedRatio(col("volume").cast("double"), col("volume_7d_avg")))
      .withColumn("price_momentum_7d",
        Cols.guardedRatio(col("price") - col("price_7d_ago"), col("price_7d_ago")))
      .filter(col("volume_spike_ratio") >= spikeMin && col("price_momentum_7d") <= momentumMax)
    flagged
      .join(broadcast(dim.select(col("entity_sk"), col("symbol"), col("entity_name"))),
        "entity_sk")
      .select(col("symbol"), col("entity_name"), col("observation_date"),
        col("volume_spike_ratio"), col("price_momentum_7d"))
      .orderBy(col("volume_spike_ratio").desc, col("price_momentum_7d").asc, col("symbol").asc)
      .limit(k)
  }

  /** U1 — interactive filters + metric threshold + top-k (NULL metric
    * passes as 0, matching the app's fillna(0) semantics). */
  def applyFilters(base: DataFrame,
      category: Option[String] = None,
      location: Option[String] = None,
      marketCapCategory: Option[String] = None,
      metric: String = "market_cap",
      minThreshold: Double = 0.0,
      limit: Option[Int] = Some(20)): DataFrame = {
    var df = base
    category.foreach(v => df = df.filter(col("category") === v))
    location.foreach(v => df = df.filter(col("location") === v))
    marketCapCategory.foreach(v => df = df.filter(col("market_cap_category") === v))
    df = df.filter(coalesce(col(metric).cast("double"), lit(0.0)) >= minThreshold)
      .orderBy(col(metric).desc_nulls_last)
    limit.map(df.limit).getOrElse(df)
  }

  /** U2 — liquidity shocks: one-sided volume z > zMin (app threshold 2,
    * deliberately distinct from Q3's |z| ≥ 3). */
  def liquidityShocks(base: DataFrame, zMin: Double = 2.0): DataFrame = {
    val stats = base.agg(
      avg(col("volume").cast("double")).as("mean_v"),
      stddev(col("volume").cast("double")).as("std_v"))
    base.crossJoin(broadcast(stats))
      .withColumn("volume_z_score",
        Cols.zScore(col("volume").cast("double"), col("mean_v"), col("std_v")))
      .filter(col("volume_z_score") > zMin)
      .drop("mean_v", "std_v")
      .orderBy(col("volume_z_score").desc)
  }

  /** U3 — KPI block: total volume (NULL→0), top-5 by volume, count. */
  def kpis(base: DataFrame): (Long, Long, DataFrame) = {
    val row = base.agg(
      sum(coalesce(col("volume"), lit(0L))).as("total_volume"),
      count(lit(1)).as("n_rows")).head()
    val top5 = base.orderBy(col("volume").desc_nulls_last).limit(5)
    (Option(row.getAs[Long]("total_volume")).getOrElse(0L), row.getAs[Long]("n_rows"), top5)
  }

  /** U3 fallback semantics (SURVEY §2.8 ⚠, ref
    * app/streamlit_app.py:407): KPIs compute over the filtered result
    * when non-empty, else over the full dataset. Emptiness comes from
    * the KPI aggregate itself (n_rows) — no separate isEmpty job over
    * the filter/sort/limit chain. */
  def kpisWithFallback(filtered: DataFrame, full: DataFrame): (Long, Long, DataFrame) = {
    val r @ (_, nRows, _) = kpis(filtered)
    if (nRows == 0) kpis(full) else r
  }

  /** U4 — build_summary_text (ref app/streamlit_app.py:206-217): top
    * symbol of the displayed (already-ordered) rows + averages over
    * non-null price/volume, rendered exactly as the app does —
    * `{avg_price:.2f}` and `{avg_volume:,.0f}`. Both paths round
    * HALF_EVEN like Python's format spec — `bround` for the price
    * (a bare decimal cast would be HALF_UP and render 0.125 as 0.13
    * where the app prints 0.12), `format_number` for the volume —
    * then decimal-cast so the rendering is engine-deterministic (same
    * approach as AppOps.u4ResultSummary); all-null columns render
    * "nan" like pandas' mean of an empty series. One aggregate job +
    * one limit(1) probe — no full collect. */
  def summaryText(results: DataFrame): String = {
    val stats = results.agg(
      count(lit(1)).as("n"),
      bround(avg(col("price").cast("double")), 2)
        .cast("decimal(18,2)").cast("string").as("avg_price_s"),
      format_number(avg(col("volume").cast("double")), 0).as("avg_volume_s")).head()
    if (stats.getAs[Long]("n") == 0L) "No rows matched the selected filters."
    else {
      val topSymbol =
        if (!results.columns.contains("symbol")) "N/A"
        else Option(results.select(col("symbol").cast("string")).limit(1).head().getString(0))
          .getOrElse("None") // str(None) — the app never guards a null symbol
      val avgPrice = Option(stats.getAs[String]("avg_price_s")).getOrElse("nan")
      val avgVolume = Option(stats.getAs[String]("avg_volume_s")).getOrElse("nan")
      s"Top result is $topSymbol. Average price across displayed rows is $avgPrice. " +
        s"Average volume across displayed rows is $avgVolume."
    }
  }

  /** The reference's 11 dbt tests + QA checks as one suite; returns
    * failing checks only (empty map = healthy warehouse). */
  def qualitySuite(stg: DataFrame, dim: DataFrame, fct: DataFrame): Map[String, Long] =
    suiteCounts(stg, dim, fct).filter(_._2 > 0)

  /** ALL 13 check counts of [[qualitySuite]], evaluated with the
    * per-frame `not_null` tests BATCHED into one aggregate job per
    * frame ([[DataQuality.nullCounts]]): 7 jobs instead of 13 —
    * 3 batched null passes + 3 `unique` group-counts + 1
    * relationship anti-join. Check definitions (and counts) are
    * identical to [[qualityChecks]], which stays as the
    * one-check-one-function definitional map. */
  def suiteCounts(stg: DataFrame, dim: DataFrame, fct: DataFrame): Map[String, Long] = {
    def pfx(p: String, m: Map[String, Long]): Map[String, Long] =
      m.map { case (c, n) => s"${p}_${c}_not_null" -> n }
    pfx("stg", DataQuality.nullCounts(stg,
        Seq("observation_sk", "entity_sk", "symbol", "scraped_at"))) ++
      pfx("dim", DataQuality.nullCounts(dim,
        Seq("entity_sk", "symbol", "entity_name"))) ++
      pfx("fct", DataQuality.nullCounts(fct,
        Seq("observation_sk", "observation_date"))) ++
      Map(
        "stg_observation_sk_unique" -> DataQuality.unique(stg, "observation_sk"),
        "dim_entity_sk_unique" -> DataQuality.unique(dim, "entity_sk"),
        "fct_observation_sk_unique" -> DataQuality.unique(fct, "observation_sk"),
        "fct_entity_sk_relationship" ->
          DataQuality.relationships(fct, "entity_sk", dim, "entity_sk"))
  }

  /** The named check set behind [[qualitySuite]], exposed so callers
    * (the oracle catalog) can report ALL check counts, not only
    * failures, against the exact same check definitions. */
  def qualityChecks(stg: DataFrame, dim: DataFrame,
      fct: DataFrame): Map[String, () => Long] =
    Map(
      "stg_observation_sk_not_null" -> (() => DataQuality.notNull(stg, "observation_sk")),
      "stg_observation_sk_unique"   -> (() => DataQuality.unique(stg, "observation_sk")),
      "stg_entity_sk_not_null"      -> (() => DataQuality.notNull(stg, "entity_sk")),
      "stg_symbol_not_null"         -> (() => DataQuality.notNull(stg, "symbol")),
      "stg_scraped_at_not_null"     -> (() => DataQuality.notNull(stg, "scraped_at")),
      "dim_entity_sk_not_null"      -> (() => DataQuality.notNull(dim, "entity_sk")),
      "dim_entity_sk_unique"        -> (() => DataQuality.unique(dim, "entity_sk")),
      "dim_symbol_not_null"         -> (() => DataQuality.notNull(dim, "symbol")),
      "dim_entity_name_not_null"    -> (() => DataQuality.notNull(dim, "entity_name")),
      "fct_observation_sk_not_null" -> (() => DataQuality.notNull(fct, "observation_sk")),
      "fct_observation_sk_unique"   -> (() => DataQuality.unique(fct, "observation_sk")),
      "fct_entity_sk_relationship"  -> (() => DataQuality.relationships(fct, "entity_sk", dim, "entity_sk")),
      "fct_observation_date_not_null" -> (() => DataQuality.notNull(fct, "observation_date")))
}
