package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyLinkSpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    (1L, "ny", "jon smith"),
    (2L, "ny", "john smith"),   // dist 1 from jon smith
    (3L, "ny", "jane smith"),   // dist 3 from jon, 2 from john
    (4L, "la", "jon smith"),    // same name as 1 but different block
    (5L, "la", "jon smyth"),    // dist 1 from 4
    (6L, "ny", "completely different")
  ).toDF("id", "city", "name")

  test("matches within blocks at the distance cut, never across blocks") {
    val got = FuzzyLink.selfMatch(people, "id", "name", Seq("city"), maxDist = 1)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Int)]
      .collect().toSet
    assert(got == Set((1L, 2L, 1), (4L, 5L, 1)))
  }

  test("agrees with an unblocked brute-force reference at a wider cut") {
    val rows = people.as[(Long, String, String)].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 == b._2 && lev(a._3, b._3) <= 3
    } yield (a._1, b._1, lev(a._3, b._3))).toSet
    val got = FuzzyLink.selfMatch(people, "id", "name", Seq("city"), maxDist = 3)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Int)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("NULL strings and NULL block keys never match") {
    val withNulls = Seq(
      (1L, Option("ny"), Option("abc")),
      (2L, Option("ny"), None),
      (3L, None, Option("abc")),
      (4L, Option("ny"), Option("abd"))
    ).toDF("id", "city", "name")
    val got = FuzzyLink.selfMatch(withNulls, "id", "name", Seq("city"), maxDist = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 4L)))
  }

  test("plans a hash join on the block key — no cartesian/nested-loop") {
    val p = FuzzyLink.selfMatch(people, "id", "name", Seq("city"), maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("parameter validation fails fast") {
    intercept[IllegalArgumentException](
      FuzzyLink.selfMatch(people, "id", "name", Seq.empty, maxDist = 1))
    intercept[IllegalArgumentException](
      FuzzyLink.selfMatch(people, "id", "name", Seq("city"), maxDist = 99))
  }
}
