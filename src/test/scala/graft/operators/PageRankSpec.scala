package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("the hub of a star graph outranks every leaf") {
    // 0 is connected to 1..6; leaves only to the hub
    val edges = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val r = PageRank.ranks(edges, nIter = 5).as[(Long, Double)].collect().toMap
    val hub = r(0L)
    (1L to 6L).foreach(i => assert(r(i) < hub, s"leaf $i should rank below the hub"))
    // leaves are symmetric: identical ranks
    assert((1L to 6L).map(r).toSet.size == 1)
  }

  test("a symmetric pair splits rank equally and total mass stays ~1") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = PageRank.ranks(edges, nIter = 4).as[(Long, Double)].collect().toMap
    assert(r(1L) == r(2L))
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // quantization loss ≤ 1e-12/edge
  }

  test("ranks are bit-deterministic across runs (quantized contribution sums)") {
    val rng = new scala.util.Random(37)
    val edges = Seq.fill(200)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = PageRank.ranks(edges, nIter = 3).as[(Long, Double)].collect().toMap
    val b = PageRank.ranks(edges, nIter = 3).as[(Long, Double)].collect().toMap
    assert(a == b) // exact double equality, not approximate
  }

  test("driver and distributed paths are BIT-equal (adaptive dispatch is invisible)") {
    val rng = new scala.util.Random(91)
    val edges = Seq.fill(300)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val viaDriver = PageRank.ranks(edges, nIter = 4).as[(Long, Double)].collect().toMap
    val viaCluster = PageRank.ranks(edges, nIter = 4, driverEdgeLimit = 0)
      .as[(Long, Double)].collect().toMap
    assert(viaDriver == viaCluster) // exact double equality — the 1e-12 grid makes sums order-free
  }

  test("empty edge set yields an empty ranking; self-loops are ignored") {
    assert(PageRank.ranks(Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
    val r = PageRank.ranks(Seq((1L, 1L), (1L, 2L)).toDF("src", "dst"), nIter = 2)
      .as[(Long, Double)].collect().toMap
    assert(r.keySet == Set(1L, 2L)) // the self-loop added no node or edge
    assert(r(1L) == r(2L))
  }
}
