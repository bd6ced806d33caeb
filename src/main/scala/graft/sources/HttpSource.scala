package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Driver-side paginated HTTP ingestion — the reference's scraper
  * semantics (SURVEY.md §2.1 S1–S3, §2.4 A13; reference
  * /root/reference/scraper/scrape.py:25-180) as pure, testable logic.
  *
  * Network I/O never runs inside executors (the reference pulls ~100
  * rows per batch — executor-side fetch would be engineering a
  * distributed system around a scalar); the fetched batch enters Spark
  * via `createDataFrame` and flows into the bronze layer like any
  * other source. The page fetcher is injected so the policy logic
  * (retry, backoff, pagination, dedup, validation) is testable without
  * a network and swappable for any paginated JSON API.
  *
  * Policy constants mirror the reference exactly:
  * 4 attempts, exponential backoff 1.5·2ⁿ seconds (Retry-After
  * honored upstream of this layer), page size 25, max 20 pages, stop
  * after 2 consecutive empty pages, truncate to 100 rows, ≥90%
  * non-null coverage on required numeric fields.
  */
object HttpSource {

  final case class FetchConfig(
      pageSize: Int = 25,
      maxPages: Int = 20,
      targetRows: Int = 100,
      maxRetries: Int = 4,
      consecutiveEmptyLimit: Int = 2,
      backoffSeconds: Double => Double = attempt => 1.5 * math.pow(2, attempt))

  final case class ValidationError(msg: String) extends RuntimeException(msg)

  /** S2: retry with exponential backoff — sleep 1.5·2ⁿ for the n-th
    * (0-based) failed attempt, matching the reference schedule
    * (1.5 s, 3 s, 6 s). `sleep` injected for tests. */
  def withRetry[T](cfg: FetchConfig, sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong))(
      fetch: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < cfg.maxRetries) {
      try return fetch
      catch {
        case e: Throwable =>
          last = e
          if (attempt < cfg.maxRetries - 1) sleep(cfg.backoffSeconds(attempt.toDouble))
          attempt += 1
      }
    }
    throw last
  }

  /** S1+S3: paginate `fetchPage(start, count) => rows`, dedupe by key
    * across pages, stop on page budget / target rows / consecutive
    * empties, truncate to target. Only RAW-empty pages count toward
    * the stop rule — a page whose rows are all cross-page duplicates
    * is tolerated, as in the reference (overlapping pagination is a
    * normal API glitch there). */
  def collectPaginated[T](cfg: FetchConfig, key: T => String,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong))(
      fetchPage: (Int, Int) => Seq[T]): Seq[T] = {
    val out = scala.collection.mutable.ArrayBuffer[T]()
    val seen = scala.collection.mutable.HashSet[String]()
    var page = 0
    var consecutiveEmpty = 0
    while (page < cfg.maxPages && out.size < cfg.targetRows
        && consecutiveEmpty < cfg.consecutiveEmptyLimit) {
      val rows = withRetry(cfg, sleep)(fetchPage(page * cfg.pageSize, cfg.pageSize))
      if (rows.isEmpty) consecutiveEmpty += 1 else consecutiveEmpty = 0
      out ++= rows.filter(r => seen.add(key(r)))
      page += 1
    }
    out.take(cfg.targetRows).toSeq
  }

  /** A13: batch validation — exact row count and per-column non-null
    * coverage floor. Throws [[ValidationError]] like the reference's
    * hard failure. */
  def validate(rows: Seq[Map[String, Any]], cfg: FetchConfig,
      requiredCoverage: Map[String, Double]): Unit = {
    if (rows.size != cfg.targetRows)
      throw ValidationError(s"expected ${cfg.targetRows} rows, got ${rows.size}")
    requiredCoverage.foreach { case (col, floor) =>
      val nonNull = rows.count(r => r.get(col).exists(_ != null))
      val cov = nonNull.toDouble / rows.size
      if (cov < floor)
        throw ValidationError(f"column $col coverage $cov%.2f below floor $floor%.2f")
    }
  }

  /** Hand the batch to Spark with an explicit bronze schema. */
  def toDataFrame(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema)
}
