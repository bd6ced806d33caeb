package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus over ~10k distinct items: rank r appears
    * ~N/r times — a realistic token distribution with a long tail. */
  private def zipf(n: Int, seed: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n) {
      val u = rng.nextDouble()
      val rank = math.min(9999, math.floor(math.exp(u * math.log(10000))).toInt)
      s"w$rank"
    }
  }

  test("MG guarantee: every item above n/(k+1) is in the summary, at any partitioning") {
    val items = zipf(30000, 3)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    for (k <- Seq(8, 32, 128); parts <- Seq(1, 5, 16)) {
      val mg = udaf(HeavyHitters.mgAgg(k))
      val summary = items.toDF("item").repartition(parts)
        .agg(mg($"item")).head().getMap[String, Long](0)
      val must = truth.filter { case (_, c) => c * (k + 1) > n }.keySet
      assert(must.subsetOf(summary.keySet.toSet), s"k=$k parts=$parts missing ${must -- summary.keySet}")
      assert(summary.size <= k, s"k=$k parts=$parts size ${summary.size}")
      // summary counts never overcount and undercount by <= n/(k+1)
      summary.foreach { case (item, c) =>
        val t = truth(item)
        assert(c <= t && t - c <= n / (k + 1) + 1, s"k=$k $item sketch=$c true=$t")
      }
    }
  }

  test("certified == GROUP BY ... HAVING brute force") {
    val items = zipf(20000, 7)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    for (k <- Seq(16, 64)) {
      val expect = truth.filter { case (_, c) => c * (k + 1) > n }
        .map { case (i, c) => (i, c, n) }.toSet
      val got = HeavyHitters.certified(items.toDF("item").repartition(9), $"item", k)
        .as[(String, Long, Long)].collect().toSet
      assert(got == expect, s"k=$k")
    }
  }

  test("NULL items are excluded; empty input yields empty output") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("item")
    val got = HeavyHitters.certified(df, $"item", 4)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 2L, 3L), ("b", 1L, 3L)).filter(t => t._2 * 5 > 3))
    assert(HeavyHitters.certified(Seq.empty[String].toDF("item"), $"item", 4).count() == 0)
  }

  test("recount broadcasts the candidate set — only candidate rows enter the count shuffle") {
    val plan = HeavyHitters.certified(zipf(500, 1).toDF("item"), $"item", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("mgAgg validates k at construction") {
    intercept[IllegalArgumentException](HeavyHitters.mgAgg(0))
  }
}
