package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the steps a training-data pipeline runs
  * AFTER dedup/scoring to assemble the final mixture: keeper filtering
  * (drop every near-dup except one per cluster), per-group token
  * budgeting (take the best documents until a budget is hit), and
  * deterministic stratified sampling (reproducible rate-based
  * downsampling per stratum).
  *
  * All three are shuffle-minimal by construction:
  *  - keeper filter: components on the (small) pair graph + one
  *    broadcast-able anti-join against the corpus — the corpus itself
  *    shuffles zero times.
  *  - token budget: one window cumsum per group (groups are
  *    high-cardinality strata → WindowExec parallelizes) — no
  *    driver-side loop, no global sort.
  *  - hash sampling: pure map-side integer arithmetic on the id; the
  *    sample is a FILTER, so column pruning and pushdown still reach
  *    the scan underneath.
  */
object Curation {

  /** Documents that survive near-dup collapse: everything except
    * cluster members that are not their cluster's keeper (min id).
    * Singletons (no pair) keep themselves by definition. The dropped
    * set is usually tiny relative to the corpus (near-dup rate ≪ 1)
    * and AQE converts the anti-join to broadcast when it measures
    * small — no explicit hint, so a pathologically duplicated corpus
    * degrades to a shuffle join instead of a driver OOM. */
  def keeperFilter(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val dropped = Components.connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }

  /** Per-group token budgeting: rank each group's documents by
    * `orderBy` (best first), keep rows while the RUNNING token total
    * (inclusive of the current row) stays within `budget`. The
    * classic "top documents per language until N tokens" mixture
    * step. One window per group — partitioned by a high-cardinality
    * stratum, so it parallelizes; no global sort anywhere.
    * Output = the input columns plus ONE documented column,
    * `budget_tokens` (the per-row token count the budget charged). */
  def tokenBudget(docs: DataFrame, groupCol: String, tokenCol: Column,
      orderBy: Seq[Column], budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("budget_tokens", tokenCol.cast("long"))
      .withColumn("_cum_tokens", sum(col("budget_tokens")).over(w))
      .filter(col("_cum_tokens") <= budget)
      .drop("_cum_tokens")
  }

  /** Deterministic stratified sampling: keep a row iff
    * (id·2654435761) mod P mod `modulus` < rate(stratum) — Knuth's
    * multiplicative-hash scatter in portable integer arithmetic, so
    * the exact sample is reproducible in any engine (and by the
    * DuckDB oracle). Unlisted strata keep `defaultRate`. Rates are in
    * [0, modulus] — e.g. modulus 100 ⇒ percent. Ids must be
    * NON-NEGATIVE and stay below ~3.4e9 so id·2654435761 fits in
    * int64 (engines disagree on both overflow and negative modulo:
    * Spark wraps and pmods, DuckDB errors and sign-preserves) — for
    * wider or signed id spaces hash the id to a bounded non-negative
    * value first. */
  def hashSample(docs: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultRate: Int = 0, modulus: Int = 100): DataFrame = {
    val P = TextDedup.P
    val bucket = pmod(pmod(col(idCol).cast("long") * lit(2654435761L), lit(P)), lit(modulus.toLong))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    docs.filter(bucket < rate)
  }
}
