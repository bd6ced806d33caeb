package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining: first-order Markov transition estimation
  * over per-entity ordered event streams (the batch analogue of the
  * "what do users do next" product question; also the input for
  * sequence-anomaly screens on agent/trace logs).
  *
  * Scale shape: the only wide stage touching raw data is the LEAD
  * window partitioned by entity — high cardinality, so it
  * parallelizes across executors (same shape the sessionizer uses).
  * Everything after operates on (from, to) aggregates whose
  * cardinality is #eventTypes², independent of data size.
  */
object Sequences {

  /** (from_type, to_type, n_transitions, p_transition) for every
    * observed adjacent pair within an entity's timeline.
    *
    * Ordering inside an entity is (tsCol, idCol) — the id tiebreak
    * makes the result deterministic when timestamps collide.
    * p_transition = n(from,to) / n(from,*), rounded via floor(x*1e6+.5)
    * so the FP quotient is oracle-stable.
    */
  def transitions(events: DataFrame, entityCol: String, tsCol: String,
                  idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = events
      .select(col(entityCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col(typeCol).as("from_type"), col("to_type"))

    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    // Post-aggregation window: partition count = #event types, rows
    // per partition = #event types — O(types²) regardless of scale.
    val wf = Window.partitionBy("from_type")
    counts
      .withColumn("p_transition",
        floor(col("n_transitions") / sum(col("n_transitions")).over(wf) * 1e6 + lit(0.5)) / 1e6)
  }
}
