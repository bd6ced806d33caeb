package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch diagnostic (deleted before commit): runs stream_join_views
  * once and dumps every micro-batch's progress JSON to stderr so the
  * batch count and per-phase durations are visible.
  */
object ProbeSJ {
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

/** Scratch diagnostic (deleted before commit): measures IVFADC
  * candidate volume (Σ probed-cell occupancy over the 10 anchored
  * queries) vs corpus size N at each scale factor — the evidence that
  * the probed join is sub-linear in N.
  */
object ProbeIvf {
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
