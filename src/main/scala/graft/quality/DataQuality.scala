package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the reference's dbt test tier
  * re-expressed as DataFrame assertions (SURVEY.md §5; reference
  * /root/reference/dbt_project/models/schema.yml:12-76 plus the
  * inline QA queries in /root/reference/sql/02_load_data.sql:62-182).
  *
  * Each check returns the VIOLATION count (0 = pass) so a caller can
  * aggregate a report instead of failing on first error; [[runAll]]
  * evaluates a suite in one pass per frame where possible. All checks
  * are plain aggregates/anti-joins: partial-aggregable, no collects,
  * scale-safe.
  */
object DataQuality {

  /** dbt `not_null`: rows where the column is NULL. */
  def notNull(df: DataFrame, column: String): Long =
    df.filter(col(column).isNull).count()

  /** Batched [[notNull]]: the NULL-violation count of every listed
    * column in ONE aggregate job over the frame (each dbt `not_null`
    * test is one `sum(when(isNull))` term — semantically identical to
    * per-column [[notNull]] calls, minus N−1 scans and N−1 jobs'
    * fixed scheduling). The single-pass shape of
    * [[conditionalCounts]], specialized to the null predicate. */
  def nullCounts(df: DataFrame, columns: Seq[String]): Map[String, Long] =
    conditionalCounts(df, columns.map(c => c -> col(c).isNull).toMap)

  /** dbt `unique`: number of keys appearing more than once. NULL keys
    * are excluded, matching dbt's generated test (it filters
    * `where column is not null` before grouping) — NULL-ness is
    * [[notNull]]'s job. */
  def unique(df: DataFrame, column: String): Long =
    df.filter(col(column).isNotNull)
      .groupBy(col(column)).count().filter(col("count") > 1).count()

  /** dbt `relationships`: child keys with no matching parent
    * (referential-integrity anti-join, SURVEY §2.3 J4). */
  def relationships(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): Long =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .count()

  /** dbt `accepted_values`. */
  def acceptedValues(df: DataFrame, column: String, values: Seq[String]): Long =
    df.filter(col(column).isNotNull && !col(column).isin(values: _*)).count()

  /** Reference inline-QA: conditional violation counts evaluated in a
    * single aggregate pass (sql/02_load_data.sql:66-73 pattern).
    * Returns (check name → violating rows). */
  def conditionalCounts(df: DataFrame, checks: Map[String, Column]): Map[String, Long] = {
    if (checks.isEmpty) return Map.empty
    val aggs = checks.toSeq.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    checks.keys.map(k => k -> Option(row.getAs[Long](k)).getOrElse(0L)).toMap
  }

  /** A named check suite: evaluate all, return failures only. */
  def runAll(checks: Map[String, () => Long]): Map[String, Long] =
    checks.map { case (n, f) => n -> f() }.filter(_._2 > 0)
}
