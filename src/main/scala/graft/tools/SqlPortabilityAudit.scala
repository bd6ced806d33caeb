package graft.tools

import graft.{SparkEntry, Sessions, Views}

/** Measurement main behind the verbatim two-engine SQL set's
  * exclusion notes (SqlFrontEndSpec.ansiPortable): runs EVERY catalog
  * oracle verbatim through `spark.sql` on the registered views and
  * prints, per entry, whether the text parses + analyzes + produces
  * the DataFrame-identical result (`PORTABLE`), produces a different
  * result (`MISMATCH` — the silent-semantics-change class that keeps
  * an entry excluded), or fails (`ERROR` + the first line — the
  * concrete blocker an alias bridge would have to solve). Output is
  * the evidence for which excluded entries are bridgeable and which
  * carry a genuine dialect impossibility.
  *
  * `sbt "runMain graft.tools.SqlPortabilityAudit [sfDir] [nameRegex]"`
  */
object SqlPortabilityAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val nameFilter = if (args.length > 1) Some(args(1).r) else None
    val spark = Sessions.build("graft-sql-audit")
    Views.register(spark, dir)
    SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .filter { case (name, _) => nameFilter.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, sql) =>
      val status =
        try {
          // ordered compare FIRST: an oracle that declares a total
          // ORDER BY must also produce rows in that order, so a sorted-
          // only match is reported as ORDER-ONLY (order divergence),
          // never silently promoted to PORTABLE. Oracles without a
          // total ORDER BY legitimately differ in row order alone —
          // for those the sorted compare is the correct equivalence,
          // and MISMATCH stays reserved for VALUE divergence.
          val viaSql = spark.sql(sql).toJSON.collect().toSeq
          val viaApi = SparkEntry.queries(name)(spark, dir).toJSON.collect().toSeq
          if (viaSql == viaApi) "PORTABLE"
          else if (viaSql.sorted == viaApi.sorted) "ORDER-ONLY"
          else "MISMATCH"
        } catch {
          case e: Throwable =>
            val first = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(2).mkString(" | ").take(220)
            s"ERROR $first"
        }
      println(s"AUDIT $name: $status")
    }
    spark.stop()
  }
}
