package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the ELT surface: window dedupe, keep-latest dim, and
  * MERGE-emulation upsert (SURVEY.md §2.8 L2/M1/M2, §7.4 risk #1). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("m1 staging has no duplicate (user, type, date) after window dedupe") {
    val df = PipelineOps.m1StgEvents(spark, dir)
    val dups = df.groupBy($"user_id", $"event_type", $"event_date")
      .count().filter($"count" > 1).count()
    assert(dups == 0)
  }

  test("m1 surrogate keys are deterministic sha256 hex") {
    val keys = PipelineOps.m1StgEvents(spark, dir)
      .select($"entity_sk").limit(5).as[String].collect()
    assert(keys.forall(k => k.length == 64 && k.matches("[0-9a-f]+")))
  }

  test("m2 dim is one row per user") {
    val df = PipelineOps.m2DimUsers(spark, dir)
    assert(df.count() == df.select($"user_id").distinct().count())
  }

  test("cohort retention: offset 0 counts every cohort's full size; offsets never grow") {
    val ret = PipelineOps.cohortRetention(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(ret.nonEmpty)
    val byCohort = ret.groupBy(_._1)
    byCohort.foreach { case (c, rows) =>
      val m = rows.map(t => t._2 -> t._3).toMap
      // a user is active on their own first day by definition
      assert(m.contains(0L), s"cohort $c missing offset 0")
      // retention at any offset cannot exceed the cohort's day-0 size
      m.foreach { case (off, n) => assert(n <= m(0L), s"$c offset $off") }
    }
  }

  test("j3 upsert: matched keys take the new batch, unmatched old rows survive") {
    val out = PipelineOps.j3UpsertUsers(spark, dir)
    // one row per user
    assert(out.count() == out.select($"user_id").distinct().count())
    // every user seen after the cutoff must carry batch='new'
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    val newUsers = graft.Tables.events(spark, dir)
      .filter($"ts" >= cutoff).select($"user_id").distinct()
    val wrong = out.join(newUsers, "user_id").filter($"batch" =!= "new").count()
    assert(wrong == 0)
    // users never seen after the cutoff keep their old row
    val oldOnly = graft.Tables.events(spark, dir)
      .select($"user_id").distinct().except(newUsers)
    val missingOld = oldOnly.join(out.filter($"batch" === "old"), Seq("user_id"), "left_anti").count()
    assert(missingOld == 0)
  }
}
