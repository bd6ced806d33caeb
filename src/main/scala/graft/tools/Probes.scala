package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.{Sessions, Tables}

/** Committed measurement mains backing SCALE.md's adjudications.
  *
  * These are diagnostics, not engine surface: nothing in
  * `SparkEntry`, the catalog, or the specs reaches them. They live in
  * a dedicated `tools` package so the measurement provenance of
  * SCALE.md's numbers is reproducible from the repo —
  * `sbt "runMain graft.tools.StreamJoinProbe"` /
  * `sbt "runMain graft.tools.IvfCandidateProbe <sfDir>..."`.
  */
object StreamJoinProbe {

  /** Runs `stream_join_views` twice (cold + warm) with a
    * [[StreamingQueryListener]] attached and dumps every micro-batch's
    * progress JSON to stderr — batch count, per-phase durations
    * (addBatch / getBatch / commitOffsets / walCommit), state-store
    * rows. This is the decomposition tool for SCALE.md's
    * stream-gate floor budget: machinery floor (offset log, WAL,
    * state-store commit) vs real join work shows up as the split
    * between `triggerExecution` and `addBatch` durations across the
    * four micro-batches.
    */
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-sj")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        System.err.println("PROGRESS " + e.progress.json)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.analytics.DataOps.streamJoinViews(spark, dir).count()
      System.err.println(s"RUN$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}

/** Measures IVFADC candidate volume (Σ probed-cell occupancy over the
  * 10 anchored queries) vs corpus size N at each scale factor — the
  * evidence behind SCALE.md's claim that the probed join's candidate
  * set tracks probed-cell occupancy, not N. Pass one or more sf dirs;
  * prints `N`, probed candidates, the brute-force candidate count,
  * and the fraction.
  */
object IvfCandidateProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = Sessions.build("graft-probe-ivf")
    args.foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
      val n = emb.count()
      val centroids = graft.operators.KMeans.fit(emb, k = 8, nIter = 2)
      val occ = graft.operators.KMeans.assignCells(emb, centroids)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      def cos(a: Array[Float], c: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nc = 0.0
        for (i <- a.indices) { d += a(i) * c(i); na += a(i) * a(i); nc += c(i) * c(i) }
        d / math.sqrt(na * nc)
      }
      val candidates = queries.map { case (_, q) =>
        centroids.map { case (cid, c) => (cos(q, c), cid) }
          .sortBy { case (s, cid) => (-s, cid) }.take(2)
          .map { case (_, cid) => occ.getOrElse(cid, 0L) }.sum
      }.sum
      val brute = queries.length.toLong * (n - 1)
      System.err.println(f"IVF $dir N=$n candidates=$candidates brute=$brute frac=${candidates.toDouble / brute}%.4f")
    }
    spark.stop()
  }
}

/** Decomposes `communities_lpa`'s COLD cost at a given sf dir (the r10
  * SCALE.md open item: sf100 cold 447 s vs warm 5.3 s). Stages run in
  * dependency order, each timed AFTER its inputs are persisted by the
  * previous stage, so the deltas price: the one-time corpus
  * tokenize→hash→shingle index build, the minhash/band/candidate pass,
  * the exact-Jaccard pair verification, the LPA rounds, and the final
  * community rollup. The index build is shared session state every
  * dedup/graph entry amortizes — in the bench's cold pass
  * communities_lpa merely pays it FIRST (alphabetical order).
  *
  * `sbt "runMain graft.tools.LpaColdProbe <sfDir>"`
  */
object LpaColdProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-lpa")
    val docs = Tables.documents(spark, dir)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"STAGE $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    timed("shingle_index")(
      graft.operators.TextDedup.shingleArrays(docs, n = 3).count())
    timed("lsh_candidates")(
      graft.operators.TextDedup.lshCandidates(docs, n = 3, numHashes = 16, bands = 8).count())
    timed("pair_graph_verified")(
      graft.operators.TextDedup.pairGraph(docs, n = 3, numHashes = 16, bands = 8,
        threshold = 0.5).count())
    timed("lpa_4_rounds")(
      graft.operators.Components.labelPropagation(
        graft.operators.TextDedup.pairGraph(docs, n = 3, numHashes = 16, bands = 8,
          threshold = 0.5).select(col("doc_a"), col("doc_b")),
        rounds = 4, src = "doc_a", dst = "doc_b").count())
    timed("communities_rollup")(
      graft.analytics.DataOps.communitiesLpa(spark, dir).count())
    spark.stop()
  }
}

/** Recall of the ADC codec across PQ subspace counts at a given
  * corpus — the evidence behind SCALE.md's production-dimension note
  * (fixed m = 8 under-quantizes 256-dim vectors; deployments scale m
  * with dimensionality). For each m, trains PQ(m × 256) with the
  * pq256 entry's budget (512-sample, 2 Lloyd rounds), ranks the same
  * 10 anchored queries via ADC, and prints recall@5 vs brute force.
  *
  * `sbt "runMain graft.tools.PqDimProbe <sfDir> [m,m,...]"`
  */
object PqDimProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = if (args.length > 0) args(0) else "bench-data/sf0.1-d256"
    val ms = (if (args.length > 1) args(1) else "8,16,32").split(",").map(_.trim.toInt)
    val spark = Sessions.build("graft-probe-pqdim")
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
    val exact = graft.operators.Persisted.index(
      graft.operators.Similarity.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("neighbor_id")))
    val nExact = exact.count()
    ms.foreach { m =>
      val t0 = System.nanoTime()
      val codes = graft.operators.Pq.fitCodebooks(emb, m, 256, nIter = 2, sampleN = 512)
      val hits = graft.operators.Pq.adcTopK(emb, q, codes, k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
      System.err.println(f"PQDIM $dir m=$m recall@5=${hits.toDouble / nExact}%.2f " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}

/** Decomposes `stock_stream_dim` (the heaviest streaming gate — two
  * window models + a MERGE target swap per micro-batch): runs it
  * twice (cold + warm) with a [[StreamingQueryListener]] dumping each
  * micro-batch's progress JSON (triggerExecution vs addBatch duration
  * = machinery floor vs real model work), the StreamJoinProbe
  * playbook. `sbt "runMain graft.tools.StockStreamProbe [sfDir]"` */
object StockStreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-stock-stream")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        System.err.println("PROGRESS " + e.progress.json)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.pipeline.StockCatalog.stockStreamDim(spark, dir).count()
      System.err.println(s"RUN$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
