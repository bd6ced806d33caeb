package graft.operators

import graft.SparkSpec

/** Triangle counting: exact counts on known graphs, input
  * normalization, and the plan property the operator's cost depends
  * on — the three join references to the oriented edge list must read
  * one cached frame, not re-derive the upstream chain three times. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("nodeTriangles: K4 plus a pendant edge") {
    // K4 contains 4 triangles; every K4 vertex sits in 3; the pendant
    // vertex 5 is in none and must not appear.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = Triangles.nodeTriangles(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val total = Triangles.totalTriangles(edges, "a", "b").as[Long].head()
    assert(total == 4L)
  }

  test("nodeTriangles normalizes duplicates, reversed edges, self-loops, NULLs") {
    val messy = Seq(
      (Some(1L), Some(2L)), (Some(2L), Some(1L)),  // duplicate in both orientations
      (Some(2L), Some(3L)), (Some(3L), Some(1L)),
      (Some(2L), Some(2L)),                        // self-loop
      (Some(4L), None), (None, Some(4L))           // NULL endpoints
    ).toDF("a", "b")
    val got = Triangles.nodeTriangles(messy, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("wedge and closing joins read the oriented edge list from one cached frame") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val plan = Triangles.nodeTriangles(edges, "a", "b")
      .queryExecution.executedPlan.toString
    // three references (wedge e1, wedge e2, closing edge) — each must
    // be an in-memory scan of the persisted oriented frame, so the
    // und → deg → join chain (and whatever feeds `pairs` upstream at
    // real call sites) executes once, not three times
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 3,
      s"expected >=3 InMemoryTableScan of the oriented frame, plan:\n$plan")
  }
}
