package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find reference. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Normalize a labeling so components compare by min-member id. */
  private def canon(m: Map[Long, Long]): Map[Long, Long] = {
    val byComp = m.groupBy(_._2).values
      .flatMap { grp => val mn = grp.keys.min; grp.keys.map(_ -> mn) }
    byComp.toMap
  }

  test("connectedComponents matches union-find on a random graph — BOTH paths") {
    val rng = new scala.util.Random(19)
    val edges = Seq.fill(120)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    val expected = canon(unionFind(edges))
    // default: size-gated driver union-find path
    val fast = Components.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // driverEdgeLimit = 0: the distributed min-label loop
    val dist = Components.connectedComponents(edges.toDF("src", "dst"),
        driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(canon(fast) == expected)
    assert(dist == fast, "driver and distributed paths must produce identical labels")
    // labels are canonical: every comp is the min id of its members
    assert(fast.groupBy(_._2).forall { case (comp, members) => members.keys.min == comp })
  }

  test("connectedComponents closes a long chain (worst-case diameter) — both paths") {
    val chain = (0L until 30L).map(i => (i, i + 1))
    for (lim <- Seq(Components.DriverEdgeLimit, 0L)) {
      val got = Components.connectedComponents(chain.toDF("src", "dst"),
          driverEdgeLimit = lim)
        .as[(Long, Long)].collect().toMap
      assert(got.size == 31 && got.values.forall(_ == 0L), s"limit=$lim")
    }
  }

  test("duplicate and reversed edges don't disturb either path") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L), (4L, 3L))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L)
    for (lim <- Seq(Components.DriverEdgeLimit, 0L)) {
      val got = Components.connectedComponents(edges.toDF("src", "dst"),
          driverEdgeLimit = lim)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"limit=$lim")
    }
  }

  test("per-round checkpoints are released: persistent-RDD count stays O(1) in rounds") {
    // Suites share the session and run in parallel, so OTHER suites'
    // persists can inflate any single measurement — take the best of 3
    // attempts: a real leak inflates EVERY attempt by the round count
    // (a 64-chain runs 5+ rounds), noise doesn't hit all three.
    val chain = (0L until 64L).map(i => (i, i + 1))
    val deltas = (1 to 3).map { _ =>
      val before = spark.sparkContext.getPersistentRDDs.size
      // driverEdgeLimit = 0 forces the distributed loop — the default
      // path would solve this 64-edge chain on the driver and checkpoint
      // nothing, making the leak assertion vacuous
      Components.connectedComponents(chain.toDF("src", "dst"), driverEdgeLimit = 0L).count()
      spark.sparkContext.getPersistentRDDs.size - before
    }
    // only the FINAL round's checkpoint (backing the returned frame) may
    // remain; earlier rounds' blocks must have been unpersisted
    assert(deltas.min <= 1,
      s"expected at most 1 surviving checkpoint in some attempt, deltas were $deltas")
  }

  test("self-loops are ignored; empty edge set yields empty labeling — both paths") {
    for (lim <- Seq(Components.DriverEdgeLimit, 0L)) {
      val got = Components.connectedComponents(
          Seq((5L, 5L), (1L, 2L)).toDF("src", "dst"), driverEdgeLimit = lim)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L), s"limit=$lim") // node 5: self-loop only, absent
      assert(Components.connectedComponents(
        Seq.empty[(Long, Long)].toDF("src", "dst"), driverEdgeLimit = lim).count() == 0)
    }
  }

  test("dedupGroups: one row per cluster with size and keeper (min id)") {
    // two clusters {1,2,3} (via 1-2, 2-3) and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Components.dedupGroups(pairs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 3L), (10L, 2L, 11L)))
  }

  test("labelPropagation: two cliques bridged by one edge stay two communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10: one COMPONENT, but
    // LPA keeps two dense communities (the bridge is outvoted)
    val k1 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val k2 = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val edges = (k1 ++ k2 :+ (3L, 10L)).toDF("src", "dst")
    val labels = Components.labelPropagation(edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(Components.connectedComponents(edges).select(countDistinct($"comp"))
      .as[Long].head() == 1L)
    assert(labels.filterKeys(Set(1L, 2L, 3L)).values.toSet.size == 1)
    assert(labels.filterKeys(Set(10L, 11L, 12L)).values.toSet.size == 1)
    assert(labels(1L) != labels(10L))
  }

  test("labelPropagation: deterministic tiebreak picks the smallest label") {
    // a single edge: after round 1 each node holds the other's id;
    // fixed sync rounds keep the oscillation deterministic
    val edges = Seq((5L, 9L)).toDF("src", "dst")
    val l1 = Components.labelPropagation(edges, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(l1 == Map(5L -> 9L, 9L -> 5L))
    val l2 = Components.labelPropagation(edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(l2 == Map(5L -> 5L, 9L -> 9L))
  }

  test("labelPropagation: star adopts the hub after two rounds") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val l = Components.labelPropagation(edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // round 1: leaves take hub id 1; hub takes min leaf id 2
    // round 2: hub's neighbors all hold 1 -> hub takes 1; leaves take 2
    assert(l(1L) == 1L)
    assert(Set(2L, 3L, 4L).forall(l(_) == 2L))
  }
}
