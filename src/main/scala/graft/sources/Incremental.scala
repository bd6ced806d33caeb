package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** High-watermark incremental loading — the standard warehouse pattern
  * for append-only feeds: each run loads only source rows whose
  * watermark column is STRICTLY past the target's current maximum, so
  * re-running after a partial feed (or re-running the same feed) never
  * duplicates rows. The reference reloads full CSV batches and
  * deduplicates afterwards; at 100 TB only the delta can move.
  *
  * The watermark is derived from the target itself (`max(wmCol)` —
  * a column-pruned scan answered largely from parquet footer stats)
  * rather than a side-channel control table, so the pattern has no
  * state to desynchronize. Strictly-greater semantics mean rows that
  * share the boundary instant with already-loaded data are skipped —
  * feeds whose watermark has ties must use a monotonic (ts, seq) pair
  * as `wmCol` (e.g. a monotonically increasing event id).
  */
object Incremental {

  /** Current high watermark of the parquet target (None when the
    * target does not exist yet or is empty). */
  def watermark(spark: SparkSession, targetPath: String, wmCol: String): Option[Any] =
    if (!Files.exists(Paths.get(targetPath))) None
    else Option(spark.read.parquet(targetPath).agg(max(col(wmCol))).head().get(0))

  /** Append `source` rows strictly past the target's watermark;
    * returns the number of rows appended. First call (no target)
    * loads everything. Idempotent: a second call with the same source
    * appends 0. */
  def appendSince(spark: SparkSession, targetPath: String, source: DataFrame,
      wmCol: String): Long = {
    val fresh = watermark(spark, targetPath, wmCol) match {
      case Some(w) => source.filter(col(wmCol) > lit(w))
      case None    => source
    }
    // row count from the write job itself (observe) — no second scan
    val obs = Observation()
    fresh.observe(obs, count(lit(1)).as("n"))
      .write.mode("append").parquet(targetPath)
    obs.get("n").asInstanceOf[Long]
  }
}
