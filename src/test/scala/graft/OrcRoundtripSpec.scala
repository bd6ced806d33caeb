package graft

import org.apache.spark.sql.functions._
import graft.sources.LayerWriter

/** The ORC leg of the persistence layer: a date-partitioned ORC fact
  * round-trips losslessly, partition pruning fires on the date
  * predicate, and row-level predicates reach the ORC scan as pushed
  * filters (the catalog twin `orc_roundtrip_read` gates content
  * equality against DuckDB; this pins the PLAN properties the format
  * exists for). */
class OrcRoundtripSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "2024-01-10", "view", 5.0),
    (2L, "2024-01-10", "purchase", 20.0),
    (3L, "2024-01-11", "view", 15.0),
    (4L, "2024-02-01", "view", 30.0)
  ).toDF("event_id", "event_date", "event_type", "value")

  test("date-partitioned ORC fact round-trips losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    LayerWriter.writeFact(fixture, dir, "event_date", format = "orc")
    val back = spark.read.orc(dir)
      .select($"event_id", date_format($"event_date", "yyyy-MM-dd").as("event_date"),
        $"event_type", $"value")
      .as[(Long, String, String, Double)].collect().toSet
    assert(back == fixture.as[(Long, String, String, Double)].collect().toSet)
  }

  test("partition pruning and row-level pushdown both reach the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc2").toString
    LayerWriter.writeFact(fixture, dir, "event_date", format = "orc")
    val q = spark.read.orc(dir)
      .filter($"event_date".between("2024-01-10", "2024-01-16") && $"value" > 10.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"), s"no partition pruning in:\n$plan")
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(value,10.0)"), s"value predicate not pushed in:\n$plan")
    // pruning is real: only the two January-10/11 partitions are read
    assert(q.count() == 2L)
  }
}
