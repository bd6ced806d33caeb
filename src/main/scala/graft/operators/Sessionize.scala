package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: group each key's event stream into sessions
  * separated by inactivity gaps longer than `gapSeconds` — the batch
  * twin of the streaming session windows in [[graft.streaming.Streams]]
  * (same gap semantics, so backfill and live paths agree).
  *
  * Classic two-window composition over ONE shuffle: both windows share
  * the (key, time) partitioning and ordering, so Spark plans a single
  * exchange + sort and pipelines the lag-boundary flag into the
  * running-sum session counter. Sessions per key are unbounded only by
  * that key's history — no global state, no driver involvement, and
  * key cardinality (users) gives the parallelism at any scale.
  *
  * Determinism: pass `tiebreakCols` (e.g. the event id) whenever a key
  * can carry equal timestamps — window order must be total or the
  * boundary flags (and downstream session ids) are run-dependent.
  */
object Sessionize {

  /** Events plus `session_seq` (1-based per key) and `session_id`
    * (`<key>-<seq>`). A new session starts when the gap to the key's
    * previous event reaches `gapSeconds` — i.e. an event extends the
    * session only while it falls INSIDE the half-open window
    * `[session start, last event + gap)`, exactly Spark's
    * `session_window` convention, so batch backfill and the streaming
    * path ([[graft.streaming.Streams.userSessions]]) cut sessions at
    * identical instants (parity-spec-tested). */
  def withSessionIds(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tiebreakCols: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, "sessionization needs a positive gap")
    val ord = col(tsCol).asc +: tiebreakCols.map(col(_).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    val boundary = when(prevTs.isNull ||
      (unix_micros(col(tsCol)) - unix_micros(prevTs)) >= gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("session_seq",
        sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_id", concat_ws("-", col(keyCol), col("session_seq")))
  }

  /** One row per session: key, session_seq, start/end instants, event
    * count, and duration in µs (exact integer arithmetic — portable). */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tiebreakCols: Seq[String] = Nil): DataFrame =
    withSessionIds(events, keyCol, tsCol, gapSeconds, tiebreakCols)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol)))).as("duration_us"))
}
