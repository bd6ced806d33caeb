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

  /** Quality-weighted keeper: within each duplicate cluster keep the
    * SINGLE best document by `orderBy` (best first — callers must pass
    * a TOTAL order, e.g. rounded quality DESC then id ASC, so both
    * engines pick the same keeper at FP boundaries), drop the rest.
    * [[keeperFilter]]'s min-id rule is the provenance-free form; this
    * is what production curation actually runs — a near-dup cluster
    * keeps its highest-quality member, not its oldest id.
    *
    * Shape: components on the (small) pair graph, LEFT join onto the
    * corpus (absent ⇒ singleton ⇒ own cluster of one), then one
    * row_number window PARTITIONED BY CLUSTER — cluster count is
    * corpus-scale cardinality, so WindowExec parallelizes, and only
    * cluster members carry more than one row per partition key. */
  def keeperFilterBest(docs: DataFrame, pairs: DataFrame, orderBy: Seq[Column],
      idCol: String = "doc_id", aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val comps = Components.connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
    val withComp = docs.join(comps, Seq(idCol), "left")
      .withColumn("_comp", coalesce(col("comp"), col(idCol)))
      .drop("comp")
    val w = Window.partitionBy(col("_comp")).orderBy(orderBy: _*)
    withComp.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_comp")
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

  /** Deterministic disjoint split assignment (train/val/test …):
    * attach a `split` label from contiguous bucket ranges of the same
    * portable multiplicative-hash bucket as [[hashSample]]. `cuts`
    * are (label, upperBoundExclusive) pairs with strictly ascending
    * bounds inside (0, modulus); buckets at or past the last bound
    * get `lastLabel`. Properties a training pipeline needs and a
    * rand() split lacks: reproducible in any engine (the oracle
    * replays it), exactly disjoint and exhaustive by construction,
    * and STABLE UNDER CORPUS GROWTH — a document's split depends only
    * on its own id, so adding data never migrates an old document
    * across the train/test boundary (the classic leakage accident).
    * Same id-range contract as [[hashSample]] (non-negative, below
    * ~3.4e9). NULL ids get the NULL label (flagged, not silently
    * binned). */
  def assignSplits(docs: DataFrame, idCol: String, cuts: Seq[(String, Int)],
      lastLabel: String, modulus: Int = 100): DataFrame = {
    require(cuts.nonEmpty, "need at least one (label, bound) cut")
    require(cuts.map(_._2) == cuts.map(_._2).sorted && cuts.map(_._2).distinct == cuts.map(_._2),
      "cut bounds must be strictly ascending")
    require(cuts.head._2 > 0 && cuts.last._2 < modulus,
      s"cut bounds must lie inside (0, $modulus)")
    val bucket = pmod(pmod(col(idCol).cast("long") * lit(2654435761L), lit(TextDedup.P)),
      lit(modulus.toLong))
    val split = cuts.foldRight(lit(lastLabel): Column) { case ((lbl, ub), acc) =>
      when(bucket < lit(ub.toLong), lit(lbl)).otherwise(acc)
    }
    docs.withColumn("split", when(col(idCol).isNotNull, split))
  }

  /** Weighted top-k sampling WITHOUT replacement via priority sampling
    * (Duffield–Lund–Thorup, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 54(6) 2007): each row gets priority
    * q = w/u with u uniform on (0, 1]; the sample is the k largest
    * priorities, and with threshold τ = the (k+1)-th priority the
    * adjusted weight ŵ = max(w, τ) estimates any subset-sum of w
    * unbiasedly (near-optimal variance among k-sparse estimators).
    * The curation use: sample documents proportional to length /
    * quality / token count while keeping the subset-sum estimator for
    * downstream token accounting.
    *
    * Portability: u = (bucket+1)/modulus with the repo's standard
    * multiplicative-hash bucket — modulus a power of two, so the
    * division is EXACT in doubles and q = w·modulus/(bucket+1) is one
    * IEEE division of integer-valued doubles: bit-identical on any
    * engine, fully replayable by the DuckDB oracle (no rand()).
    * Determinism note: a fixed hash means a fixed u per id — the
    * estimator's unbiasedness statement is over the hash-family draw,
    * the standard fixed-seed trade every deterministic sampler here
    * makes.
    *
    * Scale shape: the top-(k+1) selection is TakeOrderedAndProject
    * (per-partition heaps, no global sort); the rank/τ window then
    * runs over ≤ k+1 rows on one task — bounded by construction.
    * Rows with w ≤ 0 or NULL are excluded (DLT requires w > 0).
    * Ids must be non-negative and below ~3.4e9 for the same
    * multiplicative-hash overflow/modulo reasons as [[hashSample]].
    * Output: input columns + `priority`, `tau`, `w_hat`. */
  def prioritySample(docs: DataFrame, idCol: String, weight: Column, k: Int,
      modulus: Int = 1 << 20): DataFrame = {
    require(k >= 1, "prioritySample needs k >= 1")
    require(modulus >= 2 && modulus <= (1 << 20) && (modulus & (modulus - 1)) == 0,
      "modulus must be a power of two in [2, 2^20] — exact double division")
    val P = TextDedup.P
    val bucket = pmod(pmod(col(idCol).cast("long") * lit(2654435761L), lit(P)),
      lit(modulus.toLong))
    val wgt = docs.withColumn("_w", weight.cast("double"))
      .filter(col("_w").isNotNull && col("_w") > 0)
      .withColumn("priority",
        col("_w") * lit(modulus.toDouble) / (bucket + lit(1L)).cast("double"))
    val top = wgt.orderBy(col("priority").desc, col(idCol).asc).limit(k + 1)
    // ≤ k+1 rows — one partition IS the plan; the non-foldable constant
    // key silences WindowExec's single-partition warning (see
    // HistQuantiles for the same pattern)
    val w = Window.partitionBy(pmod(col(idCol).cast("long"), lit(1)))
      .orderBy(col("priority").desc, col(idCol).asc)
    val ranked = top.withColumn("_rn", row_number().over(w))
    // τ = the (k+1)-th priority; 0 when the population has ≤ k rows
    // (every row sampled ⇒ ŵ = w exactly, per DLT)
    val tau = ranked.agg(
      coalesce(max(when(col("_rn") === k + 1, col("priority"))), lit(0.0)).as("tau"))
    ranked.filter(col("_rn") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("w_hat", greatest(col("_w"), col("tau")))
      .drop("_rn", "_w")
  }

  /** PER-GROUP priority sampling: k rows per group by the same w/u
    * priorities as [[prioritySample]], with a per-group threshold
    * τ_g = the group's (k+1)-th priority and per-group adjusted
    * weights ŵ = max(w, τ_g) — DLT's estimator holds within each
    * stratum, so Σŵ per group estimates each stratum's weight total
    * (the per-language token accounting a mixture plan needs).
    *
    * Scale shape: one shuffle on the group key; the rank window
    * parallelizes across groups (the standard per-group top-k shape —
    * a GLOBAL top-k would be TakeOrderedAndProject, see
    * [[prioritySample]]); the τ frame is one row per group, broadcast
    * back. Output: input columns + `priority`, `tau`, `w_hat`. */
  def prioritySampleByGroup(docs: DataFrame, idCol: String, groupCol: String,
      weight: Column, kPerGroup: Int, modulus: Int = 1 << 20): DataFrame = {
    require(kPerGroup >= 1, "prioritySampleByGroup needs kPerGroup >= 1")
    require(modulus >= 2 && modulus <= (1 << 20) && (modulus & (modulus - 1)) == 0,
      "modulus must be a power of two in [2, 2^20] — exact double division")
    val P = TextDedup.P
    val bucket = pmod(pmod(col(idCol).cast("long") * lit(2654435761L), lit(P)),
      lit(modulus.toLong))
    val wgt = docs.withColumn("_w", weight.cast("double"))
      .filter(col("_w").isNotNull && col("_w") > 0)
      .withColumn("priority",
        col("_w") * lit(modulus.toDouble) / (bucket + lit(1L)).cast("double"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority").desc, col(idCol).asc)
    val ranked = wgt.withColumn("_rn", row_number().over(w))
    val tauG = ranked.filter(col("_rn") === kPerGroup + 1)
      .select(col(groupCol), col("priority").as("tau"))
    ranked.filter(col("_rn") <= kPerGroup)
      .join(broadcast(tauG), Seq(groupCol), "left")
      .withColumn("tau", coalesce(col("tau"), lit(0.0)))
      .withColumn("w_hat", greatest(col("_w"), col("tau")))
      .drop("_rn", "_w")
  }

  /** Temperature-based mixture resampling (the multilingual-LM
    * recipe: raise stratum shares to `p^alpha` so low-resource strata
    * are upweighted relative to their natural frequency). Computes a
    * per-stratum keep rate targeting `targetFrac` of the corpus, then
    * keeps rows with the SAME portable integer hash rule as
    * [[hashSample]] — the whole decision is reproducible by the
    * DuckDB oracle.
    *
    * Rate derivation (every FP step is engine-deterministic):
    * `p_i = c_i / N`; `q_i = floor(p_i^alpha · 1e9 + 0.5)` — each
    * stratum's temperature weight on a fixed grid, so the SUM of
    * weights is integer (order-independent across partitions);
    * `w_i = q_i / Σq`; `rate_i = min(1, w_i · floor(targetFrac·N) / c_i)`,
    * quantized to `floor(rate_i · modulus)` per-mille. `alpha = 0.5`
    * uses `sqrt` explicitly — IEEE-correctly-rounded on every engine,
    * unlike `pow`, whose libm may differ in the last ulp.
    *
    * Scale shape: stratum stats are a partial-agg rollup (strata
    * counts, not rows) broadcast back onto the corpus; the keep
    * decision is map-side integer arithmetic. The corpus never
    * shuffles. */
  def temperatureMix(docs: DataFrame, strataCol: String, idCol: String,
      alpha: Double = 0.5, targetFrac: Double = 0.3, modulus: Int = 1000): DataFrame = {
    require(alpha > 0 && targetFrac > 0 && targetFrac <= 1 && modulus > 0,
      "temperatureMix needs alpha > 0, 0 < targetFrac <= 1, modulus > 0")
    val P = TextDedup.P
    def tempPow(p: Column): Column =
      if (alpha == 0.5) sqrt(p) else pow(p, alpha)
    val perStratum = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("c"))
    val stats = perStratum
      .crossJoin(broadcast(perStratum.agg(sum(col("c")).as("n"))))
      .withColumn("q", floor(tempPow(col("c") / col("n")) * 1e9 + 0.5).cast("long"))
    val rates = stats
      .crossJoin(broadcast(stats.groupBy().agg(sum(col("q")).as("qsum"))))
      .withColumn("target", floor(lit(targetFrac) * col("n")).cast("long"))
      .withColumn("rate_raw",
        least(lit(1.0), (col("q").cast("double") / col("qsum")) * col("target") / col("c")))
      .withColumn("rate_pm", floor(col("rate_raw") * modulus).cast("long"))
      .select(col(strataCol), col("c").as("stratum_docs"), col("rate_pm"))
    val bucket = pmod(pmod(col(idCol).cast("long") * lit(2654435761L), lit(P)), lit(modulus.toLong))
    docs.join(broadcast(rates), strataCol)
      .filter(bucket < col("rate_pm"))
  }
}
