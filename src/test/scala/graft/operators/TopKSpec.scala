package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, Double, Long)]) =
    rows.toDF("g", "score", "id")

  private def brute(rows: Seq[(String, Double, Long)], k: Int) =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (_, s, i) => (-s, i) }.take(k).zipWithIndex.map {
        case ((_, s, i), pos) => (g, (pos + 1).toLong, i, s)
      }
    }.toSet

  test("topKByKey == row_number brute force, ties broken by id asc") {
    val rows = Seq(
      ("a", 5.0, 1L), ("a", 7.0, 2L), ("a", 7.0, 3L), ("a", 1.0, 4L),
      ("b", 2.0, 5L), ("b", 2.0, 6L),
      ("c", 9.0, 7L))
    for (k <- Seq(1, 2, 3, 10)) {
      val got = TopK.topKByKey(frame(rows), $"g", $"score", $"id", k)
        .as[(String, Long, Long, Double)].collect().toSet
      assert(got == brute(rows, k), s"k=$k")
    }
  }

  test("partition-invariant: same result at 1, 3, and 8 partitions") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(500)(
      (s"g${rng.nextInt(7)}", rng.nextInt(50).toDouble, rng.nextInt(1000).toLong))
    val expect = TopK.topKByKey(frame(rows).coalesce(1), $"g", $"score", $"id", 5)
      .as[(String, Long, Long, Double)].collect().toSet
    for (n <- Seq(3, 8)) {
      val got = TopK.topKByKey(frame(rows).repartition(n), $"g", $"score", $"id", 5)
        .as[(String, Long, Long, Double)].collect().toSet
      assert(got == expect, s"partitions=$n")
    }
  }

  test("NULL keys, scores, and ids are excluded; groups smaller than k keep all rows") {
    val df = Seq(
      (Some("a"), Some(3.0), Some(1L)),
      (None: Option[String], Some(9.0), Some(2L)),
      (Some("a"), None: Option[Double], Some(3L)),
      (Some("a"), Some(2.0), None: Option[Long]),
      (Some("b"), Some(1.0), Some(4L)))
      .toDF("g", "score", "id")
    val got = TopK.topKByKey(df, $"g", $"score", $"id", 3)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == Set(("a", 1L, 1L, 3.0), ("b", 1L, 4L, 1.0)))
  }

  test("aggregation state stays bounded: plan partial-aggregates, no window exchange-sort") {
    val plan = TopK.topKByKey(frame(Seq(("a", 1.0, 1L))), $"g", $"score", $"id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "top-k must not fall back to WindowExec")
    // ObjectHashAggregate runs twice (partial + final) around the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("topKAgg validates k at construction") {
    intercept[IllegalArgumentException](TopK.topKAgg(0))
  }

  test("NaN scores are excluded like NULL — never silently mis-sorted into the buffer") {
    // NaN breaks the (score DESC, id ASC) total order: with it in the
    // buffer, which rows survive depends on arrival order. The filter
    // must drop it deterministically instead.
    val df = Seq(
      ("a", Double.NaN, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L),
      ("b", Double.NaN, 4L)) // group with ONLY a NaN score vanishes
      .toDF("g", "score", "id")
    val got = TopK.topKByKey(df, $"g", $"score", $"id", 2)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == Set(("a", 1L, 2L, 3.0), ("a", 2L, 3L, 2.0)))
  }
}
