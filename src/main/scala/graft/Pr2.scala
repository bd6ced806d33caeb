package graft
import org.apache.spark.sql.functions._
object Pr2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("stream-probe")
    val dir = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-30s ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
    // warm the session
    graft.analytics.DataOps.streamHourlyRollup(spark, dir).count()
    // now instrument a manual replica of the hourly gate
    import org.apache.spark.sql.streaming.Trigger
    val ev = Tables.events(spark, dir)
      .filter(pmod(col("event_id"), lit(5)) === 1 && col("ts").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val mid = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
    val work = graft.sources.LocalFs.scratchDir("probe_hourly")
    val inDir = s"$work/in"; val target = s"$work/target"; val ckpt = s"$work/ckpt"
    val chunk0 = ev.filter(col("ts") < mid)
    val chunk1 = ev.filter(col("ts") >= mid)
    val spacer = chunk0.orderBy(col("ts").asc, col("event_id").asc).limit(1)
    t("4 chunk writes") {
      val seen = scala.collection.mutable.Set[java.nio.file.Path]()
      Seq(chunk0, chunk1, spacer, chunk0).zipWithIndex.foreach { case (df, i) =>
        df.coalesce(1).write.mode("append").parquet(inDir)
        val it = java.nio.file.Files.list(java.nio.file.Paths.get(inDir)).iterator()
        while (it.hasNext) {
          val f = it.next()
          if (f.toString.endsWith(".parquet") && !seen.contains(f)) {
            java.nio.file.Files.setLastModifiedTime(f,
              java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
            seen += f } } }
    }
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_PARTS", "4"))
    t("streaming query (4 batches)") {
      val agg = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(col("value").cast("decimal(30,2)")).as("tv"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"), col("n_events"), col("tv"))
      val q = graft.streaming.Streams.upsertSink(agg, target, ckpt, keys = Seq("hour"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    t("settled read+rollup") { spark.read.parquet(target).count() }
    graft.sources.LocalFs.deleteRecursively(work)
    spark.stop()
  }
}
