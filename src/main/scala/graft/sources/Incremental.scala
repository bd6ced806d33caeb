package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

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
  * as `wmCol` (e.g. a monotonically increasing event id). Source rows
  * with a NULL watermark are never loaded (a NULL has no position in
  * the watermark order; loading it once and then silently dropping
  * its successors on replay would be worse than rejecting it) — feeds
  * with NULL watermarks must repair them upstream.
  */
object Incremental {

  /** Current high watermark of the parquet target (None when the
    * target does not exist yet or is empty). Target existence goes
    * through the Hadoop FileSystem of the path's scheme — a
    * java.nio check would be local-FS only and silently disable
    * idempotency for object-store targets. */
  def watermark(spark: SparkSession, targetPath: String, wmCol: String): Option[Any] = {
    val p = new org.apache.hadoop.fs.Path(targetPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else Option(spark.read.parquet(targetPath).agg(max(col(wmCol))).head().get(0))
  }

  /** Append `source` rows strictly past the target's watermark;
    * returns the number of rows appended. First call (no target)
    * loads everything (except NULL-watermark rows). Idempotent: a
    * second call with the same source appends 0. */
  def appendSince(spark: SparkSession, targetPath: String, source: DataFrame,
      wmCol: String): Long = {
    val nonNull = source.filter(col(wmCol).isNotNull)
    val fresh = watermark(spark, targetPath, wmCol) match {
      case Some(w) => nonNull.filter(col(wmCol) > lit(w))
      case None    => nonNull
    }
    // row count from the write job itself (observe) — no second scan
    val obs = Observation()
    fresh.observe(obs, count(lit(1)).as("n"))
      .write.mode("append").parquet(targetPath)
    obs.get("n").asInstanceOf[Long]
  }
}
