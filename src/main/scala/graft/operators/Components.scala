package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over a near-dup pair graph — the
  * step every dedup pipeline needs after pair generation: pairs only
  * say "a duplicates b"; keeping one document per DUPLICATE CLUSTER
  * requires the transitive closure (a~b, b~c ⇒ {a,b,c} is one group
  * with one keeper).
  *
  * Algorithm: iterative min-label propagation with pointer jumping —
  * each round every node takes min(own label, neighbors' labels),
  * then shortcuts comp := comp(comp) (labels are node ids, so the
  * label's own label is one hop closer to the component root). Every
  * round is two equi-joins + one partial-aggregable min per node:
  * shuffle-partitionable, no driver-side graph. Near-dup clusters are
  * near-cliques (members are pairwise similar) and close in 2–3
  * rounds; the shortcut bounds adversarial chain-shaped graphs at
  * O(log diameter) rounds — the same guarantee class as
  * large-star/small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") with simpler per-round plans.
  *
  * Per-round state (the labels frame) is `localCheckpoint`ed — persist
  * alone is NOT enough for iterative DataFrames: a persisted frame's
  * logical plan still nests the full history of previous rounds, so
  * analyzer/optimizer time grows superlinearly with rounds (measured
  * 125 s for a 77-node graph); checkpointing truncates the plan to a
  * leaf, keeping per-round planning cost constant (same graph: ~6 s).
  * localCheckpoint trades executor-loss fault tolerance for speed —
  * a production 100 TB run would point `spark.checkpoint.dir` at
  * durable storage and use reliable `checkpoint()` instead.
  * Convergence is a changed-labels count (one action per round);
  * deterministic: min over longs has no tie ambiguity.
  */
object Components {

  /** Normalize an undirected edge list: long-cast (src, dst), both
    * directions present, self-loops dropped, duplicates removed.
    * Shared by every graph operator ([[connectedComponents]],
    * [[PageRank.ranks]]) so their graph semantics cannot drift. */
  private[operators] def symmetrize(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges.select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Edge budget below which the closure runs driver-side
    * ([[unionFindLabels]]): 2²¹ (long, long) edges = 32 MiB — the same
    * bounded-parameter-fetch policy as the Bloom bitset (≤ 2²⁷ bits,
    * BloomFilterJoin) and the k-means centroid collect. The PAIR frame
    * is not the corpus: candidate generation + cosine/Jaccard
    * verification have already shrunk it by orders of magnitude, so
    * most real dedup runs land under the budget; those that don't take
    * the distributed loop unchanged. */
  val DriverEdgeLimit: Long = 1L << 21

  /** Driver-side exact closure: union-find with path compression +
    * union by rank over a bounded edge list, roots canonicalized to
    * the component's MIN id afterwards — identical labels to the
    * distributed loop (both define comp = min member id), O(m α(m)),
    * no per-round jobs. Deterministic for any edge order. */
  private def unionFindLabels(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val idx = scala.collection.mutable.HashMap.empty[Long, Int]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def id(x: Long): Int = idx.getOrElseUpdate(x, { ids += x; ids.length - 1 })
    edges.foreach { case (a, b) => id(a); id(b) }
    val parent = Array.tabulate(ids.length)(identity)
    val rank = new Array[Byte](ids.length)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(id(a)), find(id(b)))
      if (ra != rb) {
        if (rank(ra) < rank(rb)) parent(ra) = rb
        else if (rank(rb) < rank(ra)) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) = (rank(ra) + 1).toByte }
      }
    }
    val minOfRoot = scala.collection.mutable.HashMap.empty[Int, Long]
    ids.indices.foreach { i =>
      val r = find(i)
      val m = minOfRoot.getOrElse(r, Long.MaxValue)
      if (ids(i) < m) minOfRoot(r) = ids(i)
    }
    ids.indices.map(i => (ids(i), minOfRoot(find(i)))).toArray
  }

  /** (id, comp) for every node appearing in `edges`; `comp` is the
    * smallest node id in the component (the canonical keeper under a
    * min-id keeper rule). Self-loops ignored; edges undirected.
    *
    * Adaptive execution (the AQE ethos — pick the strategy from a
    * measured statistic, not a guess): the normalized edge count is
    * read with one narrow scan; at or under `driverEdgeLimit` edges
    * the closure is solved exactly on the driver ([[unionFindLabels]]
    * — a bounded fetch, like a broadcast join's build side), above it
    * the distributed min-label + pointer-jumping loop runs. Both paths
    * produce identical labels. `driverEdgeLimit = 0` forces the
    * distributed loop (used by specs to pin its equivalence). */
  def connectedComponents(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 50, driverEdgeLimit: Long = DriverEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .filter(col("src") =!= col("dst") && col("src").isNotNull && col("dst").isNotNull)
    if (driverEdgeLimit > 0 && e.limit((driverEdgeLimit + 1).toInt).count() <= driverEdgeLimit) {
      import spark.implicits._
      val labels = unionFindLabels(
        e.as[(Long, Long)].collect())
      spark.createDataset(labels.toSeq).toDF("id", "comp")
    } else distributedComponents(edges, src, dst, maxIter)
  }

  private def distributedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int): DataFrame = {
    val sym = symmetrize(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    // LAZY checkpoints: the changed-rows count below materializes the
    // round's checkpoint inside the SAME job, so each round costs one
    // job submission instead of two (materialize + count) — the job
    // count, not the joins, dominates on a loaded scheduler.
    // Initial labels FUSE round 1's neighbor-min: with identity labels
    // the first round's join against `labels` is a no-op lookup, so
    // min(id, min neighbor id) straight off the edge list produces the
    // identical state one full round (join + window + count job)
    // cheaper — on the chain-shaped embedding pair graph that is ~15%
    // of the closure's wall time
    var labels = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("m"))
      .select(col("src").as("id"), least(col("src"), col("m")).as("comp"))
      .localCheckpoint(eager = false)
    // the frame whose checkpoint blocks back `labels` — unpersisted as
    // soon as the NEXT round's checkpoint is materialized, so block
    // -manager usage stays O(1) in rounds instead of O(maxIter)
    var current = labels
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // (1) min label among neighbors, folded with the node's own label
      val nbrMin = sym
        .join(labels.select(col("id").as("dst_id"), col("comp")), col("dst") === col("dst_id"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("nbr_comp"))
      val propagated = labels.select(col("id"), col("comp").as("old_comp"))
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("old_comp"), coalesce(col("nbr_comp"), col("old_comp"))).as("comp"),
          col("old_comp"))
      // (2) pointer jump (shortcutting): comp := comp(comp) — labels are
      // node ids, so one extra self-join halves the remaining distance
      // to the root each round, turning O(diameter) rounds into
      // O(log diameter) on chain-shaped graphs. ONE jump only: a
      // second jump within the round would reference the once-jumped
      // frame twice, doubling the un-checkpointed mid-round plan and
      // quadrupling planning cost per round (measured 6 s → 23 s on
      // the embedding pair graph) — the checkpoint boundary must stay
      // one linear chain per round
      val next = propagated
        .join(propagated.select(col("id").as("jid"), col("comp").as("jcomp")),
          col("comp") === col("jid"), "left")
        .select(col("id"), coalesce(col("jcomp"), col("comp")).as("comp"), col("old_comp"))
        .localCheckpoint(eager = false)
      // ONE action: counts changed labels AND caches the checkpoint
      // blocks every later round (and the caller) will read
      val changed = next.filter(col("comp") =!= col("old_comp")).count()
      // blocking: the next round starts against released blocks, not a
      // backlog of async drops the block manager hasn't processed yet
      current.unpersist(blocking = true)
      current = next
      labels = next.select(col("id"), col("comp"))
      done = changed == 0
      iter += 1
    }
    sym.unpersist(blocking = true)
    labels
  }

  /** Duplicate groups from a pair frame: one row per component with
    * its size and id range; `group_id` = min member id = the keeper
    * under the min-id rule. Docs with no duplicate pair don't appear
    * (they are their own keeper by definition). */
  def dedupGroups(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("comp").as("group_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("id")).as("max_doc"))
      .orderBy(col("group_id").asc)

  /** Synchronous label propagation (Raghavan et al. 2007) with FIXED
    * rounds and a deterministic tiebreak — the community-detection
    * complement of [[connectedComponents]]: components answer "what is
    * transitively connected", LPA answers "what clusters densely"
    * (a chain that merely bridges two near-cliques keeps them in one
    * component but in two communities).
    *
    * Determinism (the replayability policy): every node starts
    * labeled with its own id; each round every node adopts the
    * neighbor label with the highest count, ties broken by SMALLEST
    * label — argmax via row_number over (count DESC, label ASC), no
    * randomized update order. Fixed `rounds` (no convergence test)
    * keeps the replay finite and sidesteps sync-LPA's oscillation
    * non-termination. Per round: one equi-join edges⋈labels, one
    * partial-aggregable count, one per-node rank window — all keyed
    * shuffles, no driver state; the labels frame localCheckpoints
    * each round (the iterative-DataFrame rule documented above). */
  def labelPropagation(edges: DataFrame, rounds: Int = 4,
      src: String = "src", dst: String = "dst"): DataFrame = {
    require(rounds >= 1 && rounds <= 32, "rounds must be in [1, 32]")
    val sym = symmetrize(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cnt").desc, col("lbl").asc)
    var r = 0
    while (r < rounds) {
      val next = sym
        .join(labels.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
        .groupBy(col("src").as("id"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("id"), col("lbl"))
        .localCheckpoint(true)
      labels.unpersist(blocking = false)
      labels = next
      r += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
