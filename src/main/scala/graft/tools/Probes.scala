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
