package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Cols
import graft.operators.Persisted

/** Oracle gates for the REAL reference-vocabulary pipeline: every
  * entry here runs the actual [[StockPipeline]] code paths
  * (stgMostActives → dimEntity/fctObservations → Q1–Q5 → U1–U4 →
  * qualitySuite — the reference's exact workload, ref
  * /root/reference/dbt_project/models (all three model SQLs),
  * sql/03_analytics_queries.sql:6-148, app/streamlit_app.py:167-430)
  * over a deterministic stock-schema RAW fixture, and the DuckDB
  * oracle replays BOTH the fixture synthesis and the reference SQL
  * semantics from the same parquet tables. This closes the gap
  * between "analogue-gated" (PipelineOps/Queries/AppOps over the
  * harness schema) and "the reference's exact column vocabulary
  * hash-matches end-to-end" (VERDICT r10, Missing #1).
  *
  * The fixture (see [[rawStock]]) is synthesized map-side from
  * `customer` ⋈ `nation` — so it scales with the harness SF — and
  * deliberately exercises every dirty-input path the scraper contract
  * names (FIXTURES.md §A1): duplicate (symbol, scraped_at) rows with
  * later `_ingested_at` (W1/W2 keep-latest), whitespace-padded and
  * empty strings (TRIM/NULLIF), unparseable numerics ('N/A', '1.2.3')
  * for the TRY_ casts, ten scrape batches (dim keep-latest + Q5's
  * 7-row windows), NULL market caps, and the exact 2e9 / 1e10
  * right-closed bin boundaries (app/streamlit_app.py:82-87).
  *
  * Determinism-by-construction decisions (so the hash gate is stable
  * on ANY partitioning — the 1000-executor property):
  *  - prices are quarters (k/4): exactly representable doubles whose
  *    sums are exact in any order, so the REAL pipeline's plain
  *    `avg(price)` is bit-identical on Spark and DuckDB;
  *  - volumes/market caps are integers < 2^53 (double sums exact);
  *  - market caps are globally UNIQUE (top-k sets can't tie);
  *  - volume spikes are 5e6 + k (unique — U3's top-5 can't tie);
  *  - every duplicate group has strictly ordered `_ingested_at`.
  */
object StockCatalog {

  // ---- fixture ---------------------------------------------------------

  /** Deterministic RAW scrape batches in the scraper's 12-column
    * stringly schema + `_ingested_at` bronze metadata, derived from
    * customer ⋈ nation. One row per (customer k, batch b ∈ 0..9)
    * unless (k+b) % 11 = 0 (uneven presence — real scrape feeds miss
    * symbols), plus a DUPLICATE row (same scrape key, one hour later
    * ingest, different price) when (k+b) % 5 = 0. Mirrored verbatim
    * by [[rawSqlCtes]] for the DuckDB oracle. */
  private[pipeline] def rawStock(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_name"), col("c_mktsegment"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val batches = spark.range(0, 10).select(col("id").as("b"))
    val dups = spark.range(0, 2).select(col("id").as("dup"))
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .crossJoin(broadcast(batches))
      .crossJoin(broadcast(dups))
      .filter((col("k") + col("b")) % 11 =!= 0)
      .filter(col("dup") === 0 || (col("k") + col("b")) % 5 === 0)
      // price index wraps mod 2000 within an entity's batch series
      // (step 771), so 7-batch momentum changes sign — Q5's filter has
      // real positives AND real negatives to separate
      .withColumn("pi", (col("k") * 997 + col("b") * 771 + col("dup") * 499) % 2000)
      .select(
        concat(lit("SYM"), col("k").cast("string")).as("symbol"),
        when(col("k") % 7 === 0, concat(lit("  "), col("c_name"), lit(" ")))
          .otherwise(col("c_name")).as("entity_name"),
        col("c_mktsegment").as("category"),
        when((col("k") + col("b")) % 23 === 0, lit("")).otherwise(col("n_name")).as("location"),
        when(col("k") % 2 === 0, lit("NYSE")).otherwise(lit("NASDAQ")).as("exchange"),
        lit("USD").as("currency"),
        when(col("dup") === 0 && (col("k") + col("b")) % 17 === 0, lit("N/A"))
          .when(col("dup") === 0 && (col("k") + col("b")) % 29 === 0, lit(""))
          .otherwise(concat(expr("pi div 4").cast("string"), lit("."),
            ((col("pi") % 4) * 25).cast("string"))).as("price"),
        // bin boundaries ride the LAST batch so dimEntity's keep-latest
        // surfaces them in market_cap_category (right-closed: exactly
        // 2e9 → Small, exactly 1e10 → Mid — app/streamlit_app.py:82-87)
        when(col("k") === 31 && col("b") === 9, lit("2000000000"))
          .when(col("k") === 37 && col("b") === 9, lit("10000000000"))
          .when((col("k") + col("b")) % 13 === 0, lit(""))
          .otherwise((col("k") * 1000000 + col("k") % 997 + col("b") * 1000 + col("dup") * 13)
            .cast("string")).as("market_cap"),
        when((col("k") + col("b")) % 101 === 0, (lit(5000000) + col("k")).cast("string"))
          .when((col("k") + col("b")) % 41 === 0, lit("1.2.3"))
          // step 7919 makes volume swing across an entity's batches, so
          // Q5's trailing-average spike ratio crosses 1.5 organically
          .otherwise(((col("k") * 97 + col("b") * 7919) % 100000).cast("string")).as("volume"),
        when((col("k") + col("b")) % 43 === 0, lit(" "))
          .otherwise(((col("k") * 89 + col("b") * 7) % 90000).cast("string")).as("avg_volume_3m"),
        lit("https://finance.example.com/most-actives").as("source_url"),
        concat(lit("2024-01-"), (col("b") + 10).cast("string"), lit(" 09:30:00")).as("scraped_at"),
        concat(lit("2024-01-"), (col("b") + 10).cast("string"),
          when(col("dup") === 1, lit(" 11:00:00")).otherwise(lit(" 10:00:00")))
          .cast("timestamp").as("_ingested_at"))
  }

  /** The staging mart, computed once per corpus. Below the entity
    * budget: session-cached (Persisted.index dedupes by canonicalized
    * plan, so all entries share ONE cache entry per sf dir). Above it,
    * the CACHE is the measured scratch bound (SCALE.md r12: 24.6 GB of
    * block-manager spill co-resident with the consumers' own shuffles
    * ENOSPCs q5/quality_suite at the synthetic sf100) — so do what a
    * warehouse run actually does and MATERIALIZE stg as a table:
    * write-once compact columnar parquet on disk scratch, read back.
    * Columnar beats the cache twice at scale: snappy parquet is ~¼ the
    * serialized block size, and every consumer gets column pruning
    * (q5's windows read 4 of the 15 stg columns; the cache always
    * rehydrates whole rows). Value-identical by construction
    * (write-then-read of the same plan; spec-pinned on the fixture). */
  private def stg(spark: SparkSession, dir: String): DataFrame =
    if (entityCount(spark, dir) <= DimWindowEntityBudget)
      Persisted.index(StockPipeline.stgMostActives(rawStock(spark, dir)))
    else stgSnapshot(spark, dir)

  private val stgSnapshotMemo = new scala.collection.concurrent.TrieMap[String, String]()

  /** Write-once parquet materialization of the stg mart for `dir`
    * (process-lifetime memo + _SUCCESS guard — concurrent first
    * callers race benignly on `mode(overwrite)` of the same
    * deterministic bytes). Disk tmpdir, NOT the RAM-backed shm
    * scratch: this frame is the multi-GB one the RAM path exists to
    * avoid. The two sha256 keys are stored as 32-byte BINARY and
    * re-hexed map-side on read (sha2 emits lowercase hex; unhex∘hex
    * is exact): the hex form is incompressible and DOUBLE the bytes,
    * and it dominated the first cut of this snapshot (20 GB at the
    * synthetic sf100) — binary keys cut both the write and every
    * pruned key-column scan roughly in half. */
  private[pipeline] def stgSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val path = stgSnapshotMemo.getOrElseUpdate(dir, {
      val pid = ProcessHandle.current().pid()
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_stock_stg_${pid}_" +
        s"${math.floorMod(dir.hashCode, 1 << 30)}"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p, "_SUCCESS")))
        StockPipeline.stgMostActives(rawStock(spark, dir))
          .withColumn("entity_sk", unhex(col("entity_sk")))
          .withColumn("observation_sk", unhex(col("observation_sk")))
          .write.mode("overwrite").parquet(p)
      p
    })
    spark.read.parquet(path)
      .withColumn("entity_sk", lower(hex(col("entity_sk"))))
      .withColumn("observation_sk", lower(hex(col("observation_sk"))))
      .select(StockPipeline.stgColumns.map(col): _*)
  }

  /** Entity-count budget for the dim's WINDOW form: the synthetic
    * decades scale ENTITIES with facts (the reference's dim is
    * hundreds of rows — SCALE.md adjudication), and the window form
    * shuffles O(facts) rows with 64-byte keys to rank them — measured
    * green at sf10 (1.5M entities, 27M facts) and measured FATAL at
    * sf100 (15M entities, 273M facts: the ~35 GB keep-latest sort
    * co-resident with the ~35 GB persisted stg exceeds the box's
    * scratch). 2²¹ sits between the decades; above it the
    * value-identical partial-aggregable form takes over
    * ([[StockPipeline.dimEntityScalable]] — O(entities) shuffle,
    * bit-equality spec-pinned), so every dim-joining entry keeps one
    * oracle at any SF. The statistic is one memoized customer count
    * (the fixture's entity driver). The same budget gates the stg
    * cache-vs-parquet-snapshot dispatch ([[stg]]): both costs are
    * fixture-entity-driven and bind at the same decade. */
  private[pipeline] val DimWindowEntityBudget: Long = 1L << 21

  private val entityCountMemo = new scala.collection.concurrent.TrieMap[String, Long]()

  private def entityCount(spark: SparkSession, dir: String): Long =
    entityCountMemo.getOrElseUpdate(dir, Tables.customer(spark, dir).count())

  private def dim(spark: SparkSession, dir: String): DataFrame =
    if (entityCount(spark, dir) <= DimWindowEntityBudget)
      StockPipeline.dimEntity(stg(spark, dir))
    else StockPipeline.dimEntityScalable(stg(spark, dir))

  private def fct(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.fctObservations(stg(spark, dir))

  private def obs(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.observationsWithEntity(fct(spark, dir), dim(spark, dir))

  // ---- DuckDB mirror of the fixture + marts ---------------------------

  /** The raw fixture + stg/dim/fct/obs marts as DuckDB CTEs. The raw
    * synthesis mirrors [[rawStock]] expression-for-expression (integer
    * arithmetic only — engine-identical); the mart CTEs replay the
    * reference's staging SQL semantics (dbt stg_most_actives.sql:5-53,
    * dim_entity.sql:15-31, fct_observations.sql:5-30) the way
    * [[StockPipeline]] implements them. */
  private val ctes: String =
    """WITH raw0 AS (
      |  SELECT c_custkey AS k, c_name, c_mktsegment, n_name, b, dup
      |  FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9)) batches(b)
      |  CROSS JOIN (VALUES (0),(1)) dups(dup)
      |  WHERE (c_custkey + b) % 11 <> 0
      |    AND (dup = 0 OR (c_custkey + b) % 5 = 0)
      |), rawt AS (
      |  SELECT *, (k * 997 + b * 771 + dup * 499) % 2000 AS pi FROM raw0
      |), braw AS (
      |  SELECT
      |    'SYM' || CAST(k AS STRING) AS symbol,
      |    CASE WHEN k % 7 = 0 THEN '  ' || c_name || ' ' ELSE c_name END AS entity_name,
      |    c_mktsegment AS category,
      |    CASE WHEN (k + b) % 23 = 0 THEN '' ELSE n_name END AS location,
      |    CASE WHEN k % 2 = 0 THEN 'NYSE' ELSE 'NASDAQ' END AS exchange,
      |    'USD' AS currency,
      |    CASE WHEN dup = 0 AND (k + b) % 17 = 0 THEN 'N/A'
      |         WHEN dup = 0 AND (k + b) % 29 = 0 THEN ''
      |         ELSE CAST(CAST(floor(pi / 4) AS BIGINT) AS STRING) || '.' || CAST((pi % 4) * 25 AS STRING)
      |    END AS price,
      |    CASE WHEN k = 31 AND b = 9 THEN '2000000000'
      |         WHEN k = 37 AND b = 9 THEN '10000000000'
      |         WHEN (k + b) % 13 = 0 THEN ''
      |         ELSE CAST(k * 1000000 + k % 997 + b * 1000 + dup * 13 AS STRING)
      |    END AS market_cap,
      |    CASE WHEN (k + b) % 101 = 0 THEN CAST(5000000 + k AS STRING)
      |         WHEN (k + b) % 41 = 0 THEN '1.2.3'
      |         ELSE CAST((k * 97 + b * 7919) % 100000 AS STRING)
      |    END AS volume,
      |    CASE WHEN (k + b) % 43 = 0 THEN ' '
      |         ELSE CAST((k * 89 + b * 7) % 90000 AS STRING)
      |    END AS avg_volume_3m,
      |    'https://finance.example.com/most-actives' AS source_url,
      |    '2024-01-' || CAST(b + 10 AS STRING) || ' 09:30:00' AS scraped_at,
      |    CAST('2024-01-' || CAST(b + 10 AS STRING) ||
      |         (CASE WHEN dup = 1 THEN ' 11:00:00' ELSE ' 10:00:00' END) AS TIMESTAMP) AS _ingested_at
      |  FROM rawt
      |), rawp AS (
      |  SELECT braw.*, TRY_CAST(trim(scraped_at) AS TIMESTAMP) AS ts_p FROM braw
      |), stg0 AS (
      |  SELECT
      |    nullif(trim(symbol), '') AS symbol,
      |    nullif(trim(entity_name), '') AS entity_name,
      |    nullif(trim(exchange), '') AS exchange,
      |    nullif(trim(currency), '') AS currency,
      |    CAST(TRY_CAST(trim(price) AS DECIMAL(18,4)) AS DOUBLE) AS price,
      |    CAST(TRY_CAST(trim(volume) AS DECIMAL(38,0)) AS BIGINT) AS volume,
      |    CAST(TRY_CAST(trim(avg_volume_3m) AS DECIMAL(38,0)) AS BIGINT) AS avg_volume_3m,
      |    CAST(TRY_CAST(trim(market_cap) AS DECIMAL(38,0)) AS BIGINT) AS market_cap,
      |    coalesce(nullif(trim(category), ''), 'Unknown') AS category,
      |    coalesce(nullif(trim(location), ''), 'Unknown') AS location,
      |    source_url,
      |    ts_p AS scraped_at_ts,
      |    CAST(ts_p AS DATE) AS observation_date,
      |    sha256(concat_ws('|', coalesce(trim(symbol), ''), coalesce(trim(entity_name), ''),
      |                     coalesce(trim(exchange), ''))) AS entity_sk,
      |    sha256(concat_ws('|', coalesce(trim(symbol), ''), coalesce(trim(entity_name), ''),
      |                     coalesce(trim(exchange), ''),
      |                     coalesce(trim(strftime(ts_p, '%Y-%m-%d %H:%M:%S')), ''))) AS observation_sk,
      |    _ingested_at
      |  FROM rawp
      |), stgd AS (
      |  SELECT * FROM (
      |    SELECT stg0.*, row_number() OVER (PARTITION BY observation_sk
      |                                      ORDER BY _ingested_at DESC NULLS LAST) AS rn
      |    FROM stg0) t
      |  WHERE rn = 1
      |), dim AS (
      |  SELECT entity_sk, symbol, entity_name, exchange, category, location,
      |         CASE WHEN market_cap IS NULL THEN 'Unknown'
      |              WHEN CAST(market_cap AS DOUBLE) <= 2000000000.0 THEN 'Small'
      |              WHEN CAST(market_cap AS DOUBLE) <= 10000000000.0 THEN 'Mid'
      |              ELSE 'Large' END AS market_cap_category,
      |         scraped_at_ts AS last_seen_at
      |  FROM (
      |    SELECT stgd.*, row_number() OVER (PARTITION BY entity_sk
      |                                      ORDER BY scraped_at_ts DESC NULLS LAST) AS rn2
      |    FROM stgd) t
      |  WHERE rn2 = 1
      |), fct AS (
      |  SELECT observation_sk, entity_sk, symbol, observation_date, scraped_at_ts,
      |         price, market_cap, volume, avg_volume_3m, source_url
      |  FROM stgd
      |), obs AS (
      |  SELECT f.observation_sk, f.entity_sk, f.observation_date, f.scraped_at_ts,
      |         f.price, f.market_cap, f.volume, f.avg_volume_3m, f.source_url,
      |         d.symbol, d.entity_name, d.exchange, d.category, d.location,
      |         d.market_cap_category, d.last_seen_at
      |  FROM fct f JOIN dim d ON f.entity_sk = d.entity_sk
      |)""".stripMargin

  // ---- catalog entries (each runs the REAL StockPipeline path) --------

  /** M1 over the stock vocabulary — the real [[StockPipeline.stgMostActives]]. */
  def stockStg(spark: SparkSession, dir: String): DataFrame =
    stg(spark, dir).select(
        col("symbol"), col("entity_name"), col("exchange"), col("currency"),
        col("price"), col("volume"), col("avg_volume_3m"), col("market_cap"),
        col("category"), col("location"), col("source_url"),
        col("scraped_at").cast("string").as("scraped_at"),
        col("observation_date").cast("string").as("observation_date"),
        col("entity_sk"), col("observation_sk"))
      .orderBy(col("observation_sk").asc)

  /** M2 — the real [[StockPipeline.dimEntity]] (keep-latest + bins). */
  def stockDimEntity(spark: SparkSession, dir: String): DataFrame =
    dim(spark, dir).select(
        col("entity_sk"), col("symbol"), col("entity_name"), col("exchange"),
        col("category"), col("location"), col("market_cap_category"),
        col("last_seen_at").cast("string").as("last_seen_at"))
      .orderBy(col("entity_sk").asc)

  /** The dim's PARTIAL-AGGREGABLE form, FORCED ([[StockPipeline
    * .dimEntityScalable]]) — the keep-latest shape the adaptive
    * dispatch uses above [[DimWindowEntityBudget]]. Deliberately
    * shares `stock_dim_entity`'s oracle text (the q4 HLL-twin
    * pattern): the hash gate certifies the O(entities)-shuffle form
    * is value-identical to the reference's window formulation at
    * every oracle SF, so the dispatch can never silently change a
    * gated value. */
  def stockDimEntityScalable(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.dimEntityScalable(stg(spark, dir)).select(
        col("entity_sk"), col("symbol"), col("entity_name"), col("exchange"),
        col("category"), col("location"), col("market_cap_category"),
        col("last_seen_at").cast("string").as("last_seen_at"))
      .orderBy(col("entity_sk").asc)

  /** M3 — the real [[StockPipeline.fctObservations]] projection. */
  def stockFctObservations(spark: SparkSession, dir: String): DataFrame =
    fct(spark, dir).select(
        col("observation_sk"), col("entity_sk"), col("symbol"),
        col("observation_date").cast("string").as("observation_date"),
        col("scraped_at").cast("string").as("scraped_at"),
        col("price"), col("market_cap"), col("volume"), col("avg_volume_3m"),
        col("source_url"))
      .orderBy(col("observation_sk").asc)

  /** Q1 — the real [[StockPipeline.q1TopMarketCap]] (already totally
    * ordered; market caps are fixture-unique so the top-10 set can't
    * tie). */
  def stockQ1(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.q1TopMarketCap(fct(spark, dir), dim(spark, dir), k = 10)

  /** Q2 — the real [[StockPipeline.q2DailyTrend]]. Prices are quarters
    * and volumes integers, so the pipeline's plain `avg` is exact in
    * any summation order; the micro-rounding here only pins the final
    * division's text rendering. */
  def stockQ2(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.q2DailyTrend(fct(spark, dir))
      .select(
        col("observation_date").cast("string").as("observation_date"),
        Cols.r(col("avg_price"), 6).as("avg_price"),
        Cols.r(col("avg_volume"), 6).as("avg_volume"),
        col("n_entities"))
      .orderBy(col("observation_date").asc)

  /** Q3 — the real [[StockPipeline.q3VolumeOutliers]] at the app's
    * z ≥ 2 scale (fixture spikes sit at z ≈ 10, the bulk at |z| < 0.2,
    * so the threshold is decision-stable under last-ulp stddev
    * differences between engines). */
  def stockQ3(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.q3VolumeOutliers(fct(spark, dir), dim(spark, dir), zMin = 2.0)
      .select(col("symbol"), col("entity_name"),
        col("observation_date").cast("string").as("observation_date"),
        col("volume"), Cols.r(col("volume_z_score"), 4).as("volume_z_score"))
      .orderBy(abs(col("volume_z_score")).desc, col("symbol").asc,
        col("observation_date").asc)

  /** Q4 — the real [[StockPipeline.q4GeoBreakdown]]. */
  def stockQ4(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.q4GeoBreakdown(fct(spark, dir), dim(spark, dir))
      .select(col("location"), col("n_entities"),
        Cols.r(col("avg_price"), 6).as("avg_price"),
        Cols.r(col("avg_market_cap"), 4).as("avg_market_cap"),
        col("total_volume"))
      .orderBy(col("total_volume").desc, col("location").asc)

  /** Q4's 100 TB form — the real [[StockPipeline.q4GeoBreakdownScalable]]
    * (HLL-register distinct state instead of the exact form's 64-byte-
    * key Expand; the oracle replays the registers, the linear-counting
    * branch, and the estimate arithmetic). */
  def stockQ4Scalable(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.q4GeoBreakdownScalable(fct(spark, dir), dim(spark, dir), m = 64)
      .select(col("location"), col("n_entities_est"),
        Cols.r(col("avg_price"), 6).as("avg_price"),
        Cols.r(col("avg_market_cap"), 4).as("avg_market_cap"),
        col("total_volume"))
      .orderBy(col("total_volume").desc, col("location").asc)

  /** Q5 — the real [[StockPipeline.q5RiskWatchlist]] over the 10-batch
    * observation history (so the 7-row trailing window and LAG(7) have
    * real depth). */
  def stockQ5(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.q5RiskWatchlist(fct(spark, dir), dim(spark, dir),
        spikeMin = 1.5, momentumMax = 0.0, k = 50)
      .select(col("symbol"), col("entity_name"),
        col("observation_date").cast("string").as("observation_date"),
        Cols.r(col("volume_spike_ratio"), 4).as("volume_spike_ratio"),
        Cols.r(col("price_momentum_7d"), 4).as("price_momentum_7d"))
      .orderBy(col("volume_spike_ratio").desc, col("price_momentum_7d").asc,
        col("symbol").asc, col("observation_date").asc)

  /** U1 — the real [[StockPipeline.applyFilters]] (category equality +
    * NULL-as-0 threshold + top-k on the app's joined frame). The 20-row
    * set is tie-free (unique caps); the outer sort only pins
    * presentation order for the hash. */
  def stockU1(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.applyFilters(obs(spark, dir),
        category = Some("BUILDING"), metric = "market_cap",
        minThreshold = 1000000.0, limit = Some(20))
      .select(col("observation_sk"), col("symbol"), col("entity_name"),
        col("category"), col("location"), col("market_cap_category"),
        col("market_cap"), col("price"), col("volume"),
        col("observation_date").cast("string").as("observation_date"))
      .orderBy(col("market_cap").desc_nulls_last, col("observation_sk").asc)

  /** U2 — the real [[StockPipeline.liquidityShocks]] (one-sided z > 2). */
  def stockU2(spark: SparkSession, dir: String): DataFrame =
    StockPipeline.liquidityShocks(obs(spark, dir), zMin = 2.0)
      .select(col("observation_sk"), col("symbol"),
        col("observation_date").cast("string").as("observation_date"),
        col("volume"), Cols.r(col("volume_z_score"), 4).as("volume_z_score"))
      .orderBy(col("volume_z_score").desc, col("observation_sk").asc)

  /** U3 — the real [[StockPipeline.kpis]] tuple (total volume with
    * NULL→0, row count, top-5 by volume), lifted to one frame. The
    * top-5 are the unique-volume spike rows, so the set is tie-free. */
  def stockU3(spark: SparkSession, dir: String): DataFrame = {
    val (totalVolume, nRows, top5) = StockPipeline.kpis(obs(spark, dir))
    top5.select(col("symbol"),
        col("observation_date").cast("string").as("observation_date"),
        col("volume"))
      .withColumn("total_volume", lit(totalVolume))
      .withColumn("n_rows", lit(nRows))
      .orderBy(col("volume").desc_nulls_last)
  }

  /** U4 — the real [[StockPipeline.summaryText]] over the app's
    * displayed rows (top-1 by market cap via the real applyFilters),
    * lifted to a 1-row frame. The displayed row's price is a clean
    * quarter and its volume a clean integer at every SF (fixture
    * analysis in the scaladoc above), so the bround/format_number
    * rendering is engine-exact. */
  def stockU4(spark: SparkSession, dir: String): DataFrame = {
    val shown = StockPipeline.applyFilters(obs(spark, dir),
      metric = "market_cap", minThreshold = 0.0, limit = Some(1))
    val text = StockPipeline.summaryText(shown)
    spark.range(1).select(lit(text).as("summary_text"))
  }

  /** The real [[StockPipeline.qualitySuite]] check set, reported as
    * (check, n_failed) for ALL checks — the dbt-test tier under the
    * hash gate (a healthy fixture must yield 13 zeros, and the oracle
    * recomputes each violation count from scratch). */
  def stockQualitySuite(spark: SparkSession, dir: String): DataFrame = {
    // the 13 checks run as 7 batched scalar jobs over these three
    // frames (StockPipeline.suiteCounts — per-frame not_null tests
    // share one aggregate pass); persist the derived marts so each
    // job reads a cached frame instead of re-running the
    // dedupe/keep-latest windows per check
    val s = stg(spark, dir)
    val d = Persisted.index(dim(spark, dir))
    val f = Persisted.index(fct(spark, dir))
    val counts = StockPipeline.suiteCounts(s, d, f)
    import spark.implicits._
    counts.toSeq.sortBy(_._1)
      .toDF("check_name", "n_failed")
      .orderBy(col("check_name").asc)
  }

  /** L1 — the reference's inline load-QA over the RAW stock batches
    * (ref sql/02_load_data.sql:66-73: per-batch COUNT(*) + COUNT_IF of
    * blank/unparseable fields, run before staging promotes a load).
    * The real [[graft.quality.DataQuality.conditionalCounts]] check
    * definitions drive the counts; the frame form below is the same
    * single aggregate pass, grouped per scrape batch so a bad batch is
    * visible as a row, not an average. */
  def stockRawQa(spark: SparkSession, dir: String): DataFrame =
    rawStock(spark, dir)
      .groupBy(col("scraped_at"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(Cols.tryDecimal(trim(col("price")), 18, 4).isNull &&
          Cols.cleanString(col("price")).isNotNull, 1L).otherwise(0L)).as("n_bad_price"),
        sum(when(Cols.cleanString(col("price")).isNull, 1L).otherwise(0L)).as("n_blank_price"),
        sum(when(Cols.tryNumber(trim(col("volume"))).isNull, 1L).otherwise(0L)).as("n_bad_volume"),
        sum(when(Cols.cleanString(col("market_cap")).isNull, 1L).otherwise(0L)).as("n_null_cap"),
        countDistinct(col("symbol")).as("n_symbols"))
      .orderBy(col("scraped_at").asc)

  /** STREAMING dim maintenance — the reference's hourly-scrape loop as
    * a Structured Stream: raw scrape batches arrive as in-order
    * micro-batches (three scrape windows over the 10-batch fixture),
    * and each micro-batch runs the REAL batch models
    * ([[StockPipeline.stgMostActives]] → [[StockPipeline.dimEntity]])
    * then MERGEs keep-latest state per entity into the dim target via
    * [[graft.operators.Upsert.mergeIntoPath]] — one definition of
    * truth, batch logic inside foreachBatch (the [[graft.streaming
    * .Streams.upsertSink]] pattern). Because scrape batches arrive in
    * event order (the reference's loop; enforced here by
    * writeOrderedChunks' file mtimes), the unconditional-on-match
    * MERGE — the reference's own MERGE shape, ref
    * sql/02_load_data.sql:78-165 — yields exactly the batch
    * keep-latest dim, so the ORACLE IS THE SAME SQL as
    * `stock_dim_entity`: the gate proves streamed incremental
    * maintenance ≡ the batch rebuild. */
  def stockStreamDim(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // dormant phase timer (SPARK_GRAFT_STREAM_TIMING=1): fixture write
    // vs per-micro-batch model+merge cost to stderr — the measurement
    // behind SCALE.md's decomposition of this gate's decade cost (the
    // per-batch side must scale with BATCH rows, not the corpus)
    val streamTiming = sys.env.get("SPARK_GRAFT_STREAM_TIMING").contains("1")
    def timed[T](label: => String)(f: => T): T =
      if (!streamTiming) f
      else {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(f"STREAM-PHASE ${label}%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        r
      }
    val raw = rawStock(spark, dir)
    val work = graft.sources.LocalFs.scratchDir("graft_stock_stream")
    val inDir = s"$work/in"; val target = s"$work/dim"; val ckpt = s"$work/ckpt"
    timed("fixture-write")(graft.streaming.Streams.writeOrderedChunks(inDir, Seq(
      raw.filter(col("scraped_at") < "2024-01-14"),
      raw.filter(col("scraped_at") >= "2024-01-14" && col("scraped_at") < "2024-01-18"),
      raw.filter(col("scraped_at") >= "2024-01-18"))))
    // 2 state partitions — the streaming gates' shared width (pinned
    // at first start into the checkpoint) + the scratch-checkpoint
    // conf pair, both scoped/restored by withGateSession
    graft.streaming.Streams.withGateSession(spark) { prevParts =>
      val q = spark.readStream.schema(graft.streaming.Streams.chunkSchema(raw))
        .option("maxFilesPerTrigger", 1).parquet(inDir).drop("_b")
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          if (!batch.isEmpty) timed(s"batch-$bid") {
            // this stream is STATELESS (file source → foreachBatch):
            // the 2-wide pin above exists only so the streaming gates
            // share one cheap width, but foreachBatch's BATCH jobs run
            // on the micro-batch session clone and inherit it — which
            // serialized the two window models AND the full-dim MERGE
            // anti-join into 2 tasks. At sf10 that pin was the gate's
            // real bottleneck (SCALE.md: 183 s ≈ 3 × full 1.5M-entity
            // rewrite at width 2). Restore engine width for the model
            // work; AQE coalesces it right back down for small batches,
            // so the sf0.1 gate cost is unchanged.
            batch.sparkSession.conf.set("spark.sql.shuffle.partitions", prevParts)
            graft.operators.Upsert.mergeIntoPath(batch.sparkSession, target,
              StockPipeline.dimEntity(StockPipeline.stgMostActives(batch)),
              keys = Seq("entity_sk"))
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    spark.read.parquet(target).select(
        col("entity_sk"), col("symbol"), col("entity_name"), col("exchange"),
        col("category"), col("location"), col("market_cap_category"),
        col("last_seen_at").cast("string").as("last_seen_at"))
      .orderBy(col("entity_sk").asc)
  }

  /** S-layer — the real [[StockPipeline.normalizeQuotes]] (the
    * scraper's normalize_row: falsy-string fallback chains, Python
    * float()/int() coercions with non-finite → NULL and
    * truncate-toward-zero, ref scraper/scrape.py:80-120) over a
    * deterministic raw-quote fixture with every fallback arm hit. */
  def stockNormalizeQuotes(spark: SparkSession, dir: String): DataFrame = {
    val quotes = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_name"), col("c_mktsegment"))
      .select(
        concat(lit("SYM"), col("k").cast("string")).as("symbol"),
        when(col("k") % 3 === 0, lit(null: String))
          .when(col("k") % 3 === 1, lit(""))
          .otherwise(col("c_name")).as("longName"),
        when(col("k") % 4 === 0, lit(null: String))
          .when(col("k") % 4 === 1, lit(""))
          .otherwise(concat(lit("S-"), col("c_name"))).as("shortName"),
        when(col("k") % 5 === 0, lit("")).otherwise(lit("Equity")).as("typeDisp"),
        when(col("k") % 7 === 0, lit(null: String)).otherwise(lit("EQUITY")).as("quoteType"),
        when(col("k") % 6 === 0, lit("")).otherwise(col("c_mktsegment")).as("region"),
        when(col("k") % 8 === 0, lit("")).otherwise(lit("NasdaqGS")).as("fullExchangeName"),
        lit("NMS").as("exchange"),
        lit("USD").as("currency"),
        when(col("k") % 9 === 0, lit("NaN"))
          .when(col("k") % 9 === 1, lit("Infinity"))
          .when(col("k") % 9 === 2, lit(""))
          .when(col("k") % 9 === 3, lit("n/a"))
          .when(col("k") % 9 === 4, lit("-Infinity"))
          .otherwise(concat(expr("((k * 7) % 2000) div 4").cast("string"), lit("."),
            (((col("k") * 7) % 2000 % 4) * 25).cast("string"))).as("regularMarketPrice"),
        when(col("k") % 10 === 0, lit(""))
          .when(col("k") % 10 === 1, lit("123.99"))
          .when(col("k") % 10 === 2, lit("-45.67"))
          .otherwise((col("k") * 1000 + 7).cast("string")).as("marketCap"),
        when(col("k") % 11 === 0, lit("x"))
          .otherwise(((col("k") * 97) % 100000).cast("string")).as("regularMarketVolume"),
        when(col("k") % 12 === 0, lit(""))
          .otherwise(((col("k") * 89) % 90000).cast("string")).as("averageDailyVolume3Month"))
    StockPipeline.normalizeQuotes(quotes,
        scrapedAt = lit("2024-02-01 12:00:00"), sourceUrl = lit("https://finance.example.com/screener"))
      .orderBy(col("symbol").asc)
  }

  // ---- DuckDB oracles --------------------------------------------------

  private def o(sql: String): String = ctes + "\n" + sql

  val oracles: Map[String, String] = Map(
    "stock_stg" -> o(
      """SELECT symbol, entity_name, exchange, currency, price, volume,
        |       avg_volume_3m, market_cap, category, location, source_url,
        |       CAST(scraped_at_ts AS VARCHAR(30)) AS scraped_at,
        |       CAST(observation_date AS VARCHAR(30)) AS observation_date,
        |       entity_sk, observation_sk
        |FROM stgd
        |ORDER BY observation_sk ASC""".stripMargin),
    "stock_dim_entity" -> o(
      """SELECT entity_sk, symbol, entity_name, exchange, category, location,
        |       market_cap_category,
        |       CAST(last_seen_at AS VARCHAR(30)) AS last_seen_at
        |FROM dim
        |ORDER BY entity_sk ASC""".stripMargin),
    // the aggregation-form dim must equal the window-form dim — the
    // oracle is deliberately the identical SQL as stock_dim_entity
    "stock_dim_entity_scalable" -> o(
      """SELECT entity_sk, symbol, entity_name, exchange, category, location,
        |       market_cap_category,
        |       CAST(last_seen_at AS VARCHAR(30)) AS last_seen_at
        |FROM dim
        |ORDER BY entity_sk ASC""".stripMargin),
    // the streamed incremental dim must equal the batch rebuild — the
    // oracle is deliberately the identical SQL as stock_dim_entity
    "stock_stream_dim" -> o(
      """SELECT entity_sk, symbol, entity_name, exchange, category, location,
        |       market_cap_category,
        |       CAST(last_seen_at AS VARCHAR(30)) AS last_seen_at
        |FROM dim
        |ORDER BY entity_sk ASC""".stripMargin),
    "stock_fct_observations" -> o(
      """SELECT observation_sk, entity_sk, symbol,
        |       CAST(observation_date AS VARCHAR(30)) AS observation_date,
        |       CAST(scraped_at_ts AS VARCHAR(30)) AS scraped_at,
        |       price, market_cap, volume, avg_volume_3m, source_url
        |FROM fct
        |ORDER BY observation_sk ASC""".stripMargin),
    "stock_raw_qa" -> o(
      """SELECT scraped_at,
        |       count(*) AS n_rows,
        |       CAST(count(*) FILTER (WHERE TRY_CAST(trim(price) AS DECIMAL(18,4)) IS NULL
        |                               AND nullif(trim(price), '') IS NOT NULL) AS BIGINT) AS n_bad_price,
        |       CAST(count(*) FILTER (WHERE nullif(trim(price), '') IS NULL) AS BIGINT) AS n_blank_price,
        |       CAST(count(*) FILTER (WHERE TRY_CAST(trim(volume) AS DECIMAL(38,0)) IS NULL) AS BIGINT) AS n_bad_volume,
        |       CAST(count(*) FILTER (WHERE nullif(trim(market_cap), '') IS NULL) AS BIGINT) AS n_null_cap,
        |       count(DISTINCT symbol) AS n_symbols
        |FROM braw
        |GROUP BY scraped_at
        |ORDER BY scraped_at ASC""".stripMargin),
    "stock_q1_top_market_cap" -> o(
      """SELECT symbol, entity_name, category, location,
        |       max(market_cap) AS latest_market_cap
        |FROM obs
        |GROUP BY symbol, entity_name, category, location
        |ORDER BY latest_market_cap DESC NULLS LAST, symbol ASC
        |LIMIT 10""".stripMargin),
    "stock_q2_daily_trend" -> o(
      """SELECT CAST(observation_date AS VARCHAR(30)) AS observation_date,
        |       floor((avg(price)) * 1e6 + 0.5) / 1e6 AS avg_price,
        |       floor((avg(volume)) * 1e6 + 0.5) / 1e6 AS avg_volume,
        |       count(DISTINCT entity_sk) AS n_entities
        |FROM fct
        |GROUP BY observation_date
        |ORDER BY observation_date ASC""".stripMargin),
    "stock_q3_volume_outliers" -> o(
      """, nn AS (SELECT * FROM fct WHERE volume IS NOT NULL),
        |stats AS (
        |  SELECT avg(CAST(volume AS DOUBLE)) AS mean_volume,
        |         stddev_samp(CAST(volume AS DOUBLE)) AS std_volume
        |  FROM nn
        |), z AS (
        |  SELECT d.symbol, d.entity_name,
        |         CAST(f.observation_date AS VARCHAR(30)) AS observation_date,
        |         f.volume,
        |         CASE WHEN std_volume IS NULL OR std_volume = 0 THEN NULL
        |              ELSE (CAST(f.volume AS DOUBLE) - mean_volume) / std_volume
        |         END AS zraw
        |  FROM nn f JOIN dim d ON f.entity_sk = d.entity_sk
        |  CROSS JOIN stats
        |)
        |SELECT symbol, entity_name, observation_date, volume,
        |       floor(zraw * 1e4 + 0.5) / 1e4 AS volume_z_score
        |FROM z
        |WHERE abs(zraw) >= 2.0
        |ORDER BY abs(floor(zraw * 1e4 + 0.5) / 1e4) DESC, symbol ASC, observation_date ASC""".stripMargin),
    "stock_q4_geo" -> o(
      """SELECT coalesce(location, 'Unknown') AS location,
        |       count(DISTINCT entity_sk) AS n_entities,
        |       floor((avg(price)) * 1e6 + 0.5) / 1e6 AS avg_price,
        |       floor((avg(market_cap)) * 1e4 + 0.5) / 1e4 AS avg_market_cap,
        |       CAST(sum(volume) AS BIGINT) AS total_volume
        |FROM obs
        |GROUP BY coalesce(location, 'Unknown')
        |ORDER BY total_volume DESC, location ASC""".stripMargin),
    "stock_q4_geo_scalable" -> o(
      s""", src AS (
        |  SELECT coalesce(location, 'Unknown') AS location, entity_sk AS s
        |  FROM obs
        |),
        |${graft.analytics.DataOps.dkHll("src", Seq("location"), 64, "d")},
        |sums AS (
        |  SELECT coalesce(location, 'Unknown') AS location,
        |         floor((avg(price)) * 1e6 + 0.5) / 1e6 AS avg_price,
        |         floor((avg(market_cap)) * 1e4 + 0.5) / 1e4 AS avg_market_cap,
        |         CAST(sum(volume) AS BIGINT) AS total_volume
        |  FROM obs
        |  GROUP BY coalesce(location, 'Unknown')
        |)
        |SELECT location, n_est AS n_entities_est, avg_price, avg_market_cap, total_volume
        |FROM sums JOIN dx USING (location)
        |ORDER BY total_volume DESC, location ASC""".stripMargin),
    "stock_q5_risk_watchlist" -> o(
      """, win AS (
        |  SELECT d.symbol, d.entity_name, f.observation_date, f.volume, f.price,
        |         avg(f.volume) OVER (PARTITION BY f.entity_sk
        |           ORDER BY f.observation_date ASC
        |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS volume_7d_avg,
        |         lag(f.price, 7) OVER (PARTITION BY f.entity_sk
        |           ORDER BY f.observation_date ASC) AS price_7d_ago
        |  FROM fct f JOIN dim d ON f.entity_sk = d.entity_sk
        |), scored AS (
        |  SELECT symbol, entity_name, observation_date,
        |         CASE WHEN volume_7d_avg IS NULL OR volume_7d_avg = 0 THEN NULL
        |              ELSE CAST(volume AS DOUBLE) / volume_7d_avg END AS spike,
        |         CASE WHEN price_7d_ago IS NULL OR price_7d_ago = 0 THEN NULL
        |              ELSE (price - price_7d_ago) / price_7d_ago END AS momentum
        |  FROM win
        |), top AS (
        |  SELECT * FROM scored
        |  WHERE spike >= 1.5 AND momentum <= 0.0
        |  ORDER BY spike DESC, momentum ASC, symbol ASC
        |  LIMIT 50
        |)
        |SELECT symbol, entity_name,
        |       CAST(observation_date AS VARCHAR(30)) AS observation_date,
        |       floor(spike * 1e4 + 0.5) / 1e4 AS volume_spike_ratio,
        |       floor(momentum * 1e4 + 0.5) / 1e4 AS price_momentum_7d
        |FROM top
        |ORDER BY volume_spike_ratio DESC, price_momentum_7d ASC, symbol ASC,
        |         observation_date ASC""".stripMargin),
    "stock_u1_filters" -> o(
      """, shown AS (
        |  SELECT * FROM obs
        |  WHERE category = 'BUILDING'
        |    AND coalesce(CAST(market_cap AS DOUBLE), 0.0) >= 1000000.0
        |  ORDER BY market_cap DESC NULLS LAST
        |  LIMIT 20
        |)
        |SELECT observation_sk, symbol, entity_name, category, location,
        |       market_cap_category, market_cap, price, volume,
        |       CAST(observation_date AS VARCHAR(30)) AS observation_date
        |FROM shown
        |ORDER BY market_cap DESC NULLS LAST, observation_sk ASC""".stripMargin),
    "stock_u2_shocks" -> o(
      """, stats AS (
        |  SELECT avg(CAST(volume AS DOUBLE)) AS mean_v,
        |         stddev_samp(CAST(volume AS DOUBLE)) AS std_v
        |  FROM obs
        |), z AS (
        |  SELECT observation_sk, symbol,
        |         CAST(observation_date AS VARCHAR(30)) AS observation_date, volume,
        |         CASE WHEN std_v IS NULL OR std_v = 0 THEN NULL
        |              ELSE (CAST(volume AS DOUBLE) - mean_v) / std_v END AS zraw
        |  FROM obs CROSS JOIN stats
        |)
        |SELECT observation_sk, symbol, observation_date, volume,
        |       floor(zraw * 1e4 + 0.5) / 1e4 AS volume_z_score
        |FROM z
        |WHERE zraw > 2.0
        |ORDER BY floor(zraw * 1e4 + 0.5) / 1e4 DESC, observation_sk ASC""".stripMargin),
    "stock_u3_kpis" -> o(
      """, agg AS (
        |  SELECT CAST(sum(coalesce(volume, 0)) AS BIGINT) AS total_volume,
        |         count(*) AS n_rows
        |  FROM obs
        |), top5 AS (
        |  SELECT symbol, CAST(observation_date AS VARCHAR(30)) AS observation_date, volume
        |  FROM obs
        |  ORDER BY volume DESC NULLS LAST
        |  LIMIT 5
        |)
        |SELECT symbol, observation_date, volume, total_volume, n_rows
        |FROM top5 CROSS JOIN agg
        |ORDER BY volume DESC NULLS LAST""".stripMargin),
    "stock_u4_summary" -> o(
      """, shown AS (
        |  SELECT * FROM obs
        |  WHERE coalesce(CAST(market_cap AS DOUBLE), 0.0) >= 0.0
        |  ORDER BY market_cap DESC NULLS LAST
        |  LIMIT 1
        |)
        |SELECT 'Top result is ' || symbol || '. Average price across displayed rows is ' ||
        |       CAST(CAST(price AS DECIMAL(18,2)) AS STRING) ||
        |       '. Average volume across displayed rows is ' ||
        |       format('{:,}', CAST(volume AS BIGINT)) || '.' AS summary_text
        |FROM shown""".stripMargin),
    "stock_quality_suite" -> o(
      """, checks AS (
        |  SELECT 'stg_observation_sk_not_null' AS check_name,
        |         (SELECT count(*) FROM stgd WHERE observation_sk IS NULL) AS n_failed
        |  UNION ALL SELECT 'stg_observation_sk_unique',
        |         (SELECT count(*) FROM (SELECT observation_sk FROM stgd
        |            WHERE observation_sk IS NOT NULL
        |            GROUP BY observation_sk HAVING count(*) > 1) t)
        |  UNION ALL SELECT 'stg_entity_sk_not_null',
        |         (SELECT count(*) FROM stgd WHERE entity_sk IS NULL)
        |  UNION ALL SELECT 'stg_symbol_not_null',
        |         (SELECT count(*) FROM stgd WHERE symbol IS NULL)
        |  UNION ALL SELECT 'stg_scraped_at_not_null',
        |         (SELECT count(*) FROM stgd WHERE scraped_at_ts IS NULL)
        |  UNION ALL SELECT 'dim_entity_sk_not_null',
        |         (SELECT count(*) FROM dim WHERE entity_sk IS NULL)
        |  UNION ALL SELECT 'dim_entity_sk_unique',
        |         (SELECT count(*) FROM (SELECT entity_sk FROM dim
        |            WHERE entity_sk IS NOT NULL
        |            GROUP BY entity_sk HAVING count(*) > 1) t)
        |  UNION ALL SELECT 'dim_symbol_not_null',
        |         (SELECT count(*) FROM dim WHERE symbol IS NULL)
        |  UNION ALL SELECT 'dim_entity_name_not_null',
        |         (SELECT count(*) FROM dim WHERE entity_name IS NULL)
        |  UNION ALL SELECT 'fct_observation_sk_not_null',
        |         (SELECT count(*) FROM fct WHERE observation_sk IS NULL)
        |  UNION ALL SELECT 'fct_observation_sk_unique',
        |         (SELECT count(*) FROM (SELECT observation_sk FROM fct
        |            WHERE observation_sk IS NOT NULL
        |            GROUP BY observation_sk HAVING count(*) > 1) t)
        |  UNION ALL SELECT 'fct_entity_sk_relationship',
        |         (SELECT count(*) FROM fct WHERE entity_sk IS NOT NULL
        |            AND entity_sk NOT IN (SELECT entity_sk FROM dim))
        |  UNION ALL SELECT 'fct_observation_date_not_null',
        |         (SELECT count(*) FROM fct WHERE observation_date IS NULL)
        |)
        |SELECT check_name, CAST(n_failed AS BIGINT) AS n_failed
        |FROM checks
        |ORDER BY check_name ASC""".stripMargin),
    "stock_normalize_quotes" ->
      """WITH q AS (
        |  SELECT c_custkey AS k, c_name, c_mktsegment FROM customer
        |), quotes AS (
        |  SELECT
        |    'SYM' || CAST(k AS STRING) AS symbol,
        |    CASE WHEN k % 3 = 0 THEN NULL WHEN k % 3 = 1 THEN '' ELSE c_name END AS longName,
        |    CASE WHEN k % 4 = 0 THEN NULL WHEN k % 4 = 1 THEN '' ELSE 'S-' || c_name END AS shortName,
        |    CASE WHEN k % 5 = 0 THEN '' ELSE 'Equity' END AS typeDisp,
        |    CASE WHEN k % 7 = 0 THEN NULL ELSE 'EQUITY' END AS quoteType,
        |    CASE WHEN k % 6 = 0 THEN '' ELSE c_mktsegment END AS region,
        |    CASE WHEN k % 8 = 0 THEN '' ELSE 'NasdaqGS' END AS fullExchangeName,
        |    'NMS' AS exchange,
        |    'USD' AS currency,
        |    CASE WHEN k % 9 = 0 THEN 'NaN' WHEN k % 9 = 1 THEN 'Infinity'
        |         WHEN k % 9 = 2 THEN '' WHEN k % 9 = 3 THEN 'n/a'
        |         WHEN k % 9 = 4 THEN '-Infinity'
        |         ELSE CAST(CAST(floor(((k * 7) % 2000) / 4) AS BIGINT) AS STRING) || '.' ||
        |              CAST((((k * 7) % 2000) % 4) * 25 AS STRING)
        |    END AS regularMarketPrice,
        |    CASE WHEN k % 10 = 0 THEN '' WHEN k % 10 = 1 THEN '123.99'
        |         WHEN k % 10 = 2 THEN '-45.67'
        |         ELSE CAST(k * 1000 + 7 AS STRING) END AS marketCap,
        |    CASE WHEN k % 11 = 0 THEN 'x'
        |         ELSE CAST((k * 97) % 100000 AS STRING) END AS regularMarketVolume,
        |    CASE WHEN k % 12 = 0 THEN ''
        |         ELSE CAST((k * 89) % 90000 AS STRING) END AS averageDailyVolume3Month
        |  FROM q
        |)
        |SELECT symbol,
        |       coalesce(nullif(longName, ''), nullif(shortName, ''), symbol) AS entity_name,
        |       coalesce(nullif(typeDisp, ''), nullif(quoteType, ''), 'Unknown') AS category,
        |       coalesce(nullif(region, ''), 'Unknown') AS location,
        |       coalesce(nullif(fullExchangeName, ''), exchange) AS exchange,
        |       currency,
        |       CASE WHEN isnan(TRY_CAST(regularMarketPrice AS DOUBLE))
        |              OR isinf(TRY_CAST(regularMarketPrice AS DOUBLE)) THEN NULL
        |            ELSE TRY_CAST(regularMarketPrice AS DOUBLE) END AS price,
        |       CAST(trunc(TRY_CAST(marketCap AS DOUBLE)) AS BIGINT) AS market_cap,
        |       CAST(trunc(TRY_CAST(regularMarketVolume AS DOUBLE)) AS BIGINT) AS volume,
        |       CAST(trunc(TRY_CAST(averageDailyVolume3Month AS DOUBLE)) AS BIGINT) AS avg_volume_3m,
        |       'https://finance.example.com/screener' AS source_url,
        |       '2024-02-01 12:00:00' AS scraped_at
        |FROM quotes
        |ORDER BY symbol ASC""".stripMargin
  )

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stock_stg"                -> (stockStg _),
    "stock_raw_qa"             -> (stockRawQa _),
    "stock_dim_entity"         -> (stockDimEntity _),
    "stock_dim_entity_scalable" -> (stockDimEntityScalable _),
    "stock_stream_dim"         -> (stockStreamDim _),
    "stock_fct_observations"   -> (stockFctObservations _),
    "stock_q1_top_market_cap"  -> (stockQ1 _),
    "stock_q2_daily_trend"     -> (stockQ2 _),
    "stock_q3_volume_outliers" -> (stockQ3 _),
    "stock_q4_geo"             -> (stockQ4 _),
    "stock_q4_geo_scalable"    -> (stockQ4Scalable _),
    "stock_q5_risk_watchlist"  -> (stockQ5 _),
    "stock_u1_filters"         -> (stockU1 _),
    "stock_u2_shocks"          -> (stockU2 _),
    "stock_u3_kpis"            -> (stockU3 _),
    "stock_u4_summary"         -> (stockU4 _),
    "stock_quality_suite"      -> (stockQualitySuite _),
    "stock_normalize_quotes"   -> (stockNormalizeQuotes _)
  )
}
