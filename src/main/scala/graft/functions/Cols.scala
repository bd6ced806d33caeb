package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable Column builders — the reference's scalar-function surface
  * (SURVEY.md §2.7, F1–F24) re-expressed as codegen-friendly Spark
  * built-ins. No UDFs: every builder composes `functions._` so the
  * whole pipeline stays inside WholeStageCodegen.
  *
  * Reference semantics preserved (citations = /root/reference):
  *  - cleanString: TRIM + NULLIF(x,'')           (sql/02_load_data.sql:93-98)
  *  - hash keys:   SHA2(CONCAT_WS('|', coalesced args), 256)
  *                 (sql/02_load_data.sql:81-91; dbt stg_most_actives.sql:29-47)
  *    NOTE: every arg is pre-coalesced to '' because Snowflake's
  *    COALESCE-wrapped CONCAT_WS treats NULL as '' while Spark's
  *    concat_ws would *skip* the arg (different key!).
  *  - try casts:   TRY_TO_DECIMAL/NUMBER/TIMESTAMP → try_cast
  *                 (sql/02_load_data.sql:100-107)
  *  - marketCapCategory: pandas `cut` with right-closed bins
  *                 (app/streamlit_app.py:82-88 — exactly 2e9 ⇒ Small,
  *                 exactly 1e10 ⇒ Mid, NULL ⇒ Unknown)
  *  - guardedRatio: CASE WHEN denom IS NULL OR denom = 0 THEN NULL
  *                 (sql/03_analytics_queries.sql:124-131)
  */
object Cols {

  /** F1+F2: TRIM then empty-string→NULL. */
  def cleanString(c: Column): Column = nullif(trim(c), lit(""))

  /** The pre-digest '|'-joined key material of [[hashKey]]. Grouping
    * by this string IS grouping by the hash (sha256 is a pure
    * function of it), so a dedupe window can shuffle the short raw
    * material and defer the 64-char hex digest to the SURVIVING rows
    * — at 100 TB that removes ~128 incompressible bytes per shuffled
    * row (two hex keys) and halves the sha256 compute. */
  def keyMaterial(parts: Column*): Column =
    concat_ws("|", parts.map(p => coalesce(trim(p.cast("string")), lit(""))): _*)

  /** F4+F5: deterministic surrogate key = sha256 of '|'-joined parts,
    * NULL parts as '' (matches the reference's COALESCE(TRIM(x),'')). */
  def hashKey(parts: Column*): Column =
    sha2(keyMaterial(parts: _*), 256)

  /** F6: TRY_TO_DECIMAL(x, p, s) — NULL on unparseable. */
  def tryDecimal(c: Column, precision: Int = 18, scale: Int = 4): Column =
    c.try_cast(s"decimal($precision,$scale)")

  /** F7: TRY_TO_NUMBER(x) — Snowflake default NUMBER(38,0); rounds
    * fractional strings half-up, which decimal(38,0) try_cast matches. */
  def tryNumber(c: Column): Column = c.try_cast("decimal(38,0)")

  /** F18/F22: pandas to_numeric(errors="coerce") / Python float() —
    * NULL on failure, computed as double for analytics parity. */
  def tryDouble(c: Column): Column = c.try_cast("double")

  /** F8: TRY_TO_TIMESTAMP_TZ — inputs are UTC ISO-8601. */
  def tryTimestamp(c: Column): Column = c.try_cast("timestamp")

  /** F20: pandas-cut market-cap bins, right-closed. */
  def marketCapCategory(cap: Column): Column =
    when(cap.isNull, lit("Unknown"))
      .when(cap <= lit(2e9), lit("Small"))
      .when(cap <= lit(1e10), lit("Mid"))
      .otherwise(lit("Large"))

  /** F16: NULL-guarded division (no div-by-zero, no NaN/Inf). */
  def guardedRatio(num: Column, denom: Column): Column =
    when(denom.isNull || denom === 0, lit(null)).otherwise(num / denom)

  /** z-score against pre-aggregated stats columns; NULL when stddev
    * is NULL/0 (app/streamlit_app.py:196-201 guard). */
  def zScore(x: Column, mean: Column, std: Column): Column =
    when(std.isNull || std === 0, lit(null)).otherwise((x - mean) / std)

  // ---- Exact (order-independent) float aggregation -------------------
  // Double summation is order-dependent, so a parallel Spark sum and a
  // single-threaded oracle can differ in the last ulp and flip a
  // rounding boundary. For source columns with fixed decimal precision
  // (money, quantities) we quantize each value to DECIMAL first: the
  // decimal sum is exact in ANY order, so Spark (any partitioning,
  // 1 or 1000 executors) and the oracle agree bit-for-bit. This is the
  // 100 TB-safe way to get deterministic aggregates.

  /** Portable round-half-up: floor(x·10ⁿ + 0.5)/10ⁿ. Spark's `round`
    * (BigDecimal HALF_UP over the exact binary expansion) and DuckDB's
    * `round` disagree on doubles that sit at a representation
    * boundary; this formula is the same IEEE ops in both engines, so
    * identical inputs give bit-identical outputs. Use for every float
    * column in an oracle-compared result. */
  def r(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * s + lit(0.5)) / s
  }

  /** Exact sum of a fixed-scale metric, returned as double. */
  def sumExact(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Exact mean (decimal-exact sum / non-null count), as double. */
  def avgExact(c: Column, scale: Int = 2): Column =
    sumExact(c, scale) / count(c)

  /** Exact sample stddev via decimal-exact sum and sum-of-squares:
    * sqrt((Σx² − (Σx)²/n) / (n−1)). Order-independent, so identical
    * across engines and cluster sizes. Fine for well-scaled metrics;
    * not for data where |mean| ≫ stddev (catastrophic cancellation). */
  def stddevExact(c: Column, scale: Int = 2): Column = {
    val n   = count(c).cast("double")
    val sx  = sumExact(c, scale)
    val sxx = sum((c * c).cast(s"decimal(38,${scale * 2 min 10})")).cast("double")
    sqrt((sxx - sx * sx / n) / (n - lit(1.0)))
  }
}
