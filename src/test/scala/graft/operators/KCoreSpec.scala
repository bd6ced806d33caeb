package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def g(edges: (Long, Long)*): DataFrame =
    edges.toSeq.toDF("src", "dst")

  private def core(df: DataFrame, k: Int): Map[Long, Long] =
    KCore.kCore(df, k = k).as[(Long, Long)].collect().toMap

  test("a triangle with a tail peels to exactly the triangle") {
    val c = core(g(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L), k = 2)
    assert(c == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("peeling cascades: a pure chain has no 2-core") {
    assert(core(g(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), k = 2).isEmpty)
  }

  test("K4 is a 3-core; remove one edge and the 3-core vanishes") {
    val k4 = g(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(core(k4, k = 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val k4minus = g(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L)
    assert(core(k4minus, k = 3).isEmpty)
    // ...but its 2-core survives: dropping (3,4) leaves every node
    // with two neighbors among {1,2,3,4}
    assert(core(k4minus, k = 2).keySet == Set(1L, 2L, 3L, 4L))
  }

  test("k=1 keeps every non-isolated node; self-loops and direction are ignored") {
    val c = core(g(1L -> 2L, 2L -> 1L, 3L -> 3L), k = 1)
    assert(c == Map(1L -> 1L, 2L -> 1L)) // dup direction collapses, self-loop drops
  }

  test("every reported node has core_deg >= k (invariant over a random graph)") {
    val rng = new scala.util.Random(5)
    val edges = Seq.fill(60)((rng.nextInt(20).toLong, rng.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val c = core(g(edges: _*), k = 3)
    assert(c.values.forall(_ >= 3L))
    // cross-check against a driver-side reference peel
    var adj = edges.flatMap(e => Seq(e, e.swap)).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var changed = true
    while (changed) {
      val drop = adj.collect { case (n, ns) if ns.size < 3 => n }.toSet
      changed = drop.nonEmpty
      adj = (adj -- drop).map { case (n, ns) => n -> (ns -- drop) }
        .filter(_._2.nonEmpty)
    }
    assert(c.keySet == adj.keySet)
    assert(c == adj.map { case (n, ns) => n -> ns.size.toLong })
  }

  test("driver and distributed paths agree exactly (adaptive dispatch is invisible)") {
    val rng = new scala.util.Random(73)
    val edges = Seq.fill(150)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    Seq(1, 2, 3).foreach { k =>
      val viaDriver = KCore.kCore(g(edges: _*), k = k).as[(Long, Long)].collect().toMap
      val viaCluster = KCore.kCore(g(edges: _*), k = k, driverEdgeLimit = 0)
        .as[(Long, Long)].collect().toMap
      assert(viaDriver == viaCluster, s"k=$k")
    }
  }

  test("empty input yields an empty core, not a crash") {
    assert(core(g(), k = 2).isEmpty)
  }
}
