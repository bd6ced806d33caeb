package graft.tools

import graft.Sessions

/** Interleaved A/B measurement of streaming-gate session confs —
  * the adjudication tool for this box's multi-minute stall windows
  * (SCALE.md "Box pathology"): separate-JVM single runs are too noisy
  * to price a per-gate config, so this main alternates BASELINE and
  * CANDIDATE confs around the same gate inside ONE warm JVM, N pairs,
  * and prints per-arm times. Candidate confs (the r16 streaming-floor
  * set): checkpoint file checksums off (the checkpoints are
  * query-lifetime scratch on the RAM-backed fs — integrity sidecars
  * buy nothing and cost one extra file write per checkpoint file) and
  * no-data micro-batches off (every catalog stream emits eagerly —
  * dedup/inner-join/update-mode — so the trailing watermark-eviction
  * batch is pure fixed cost; state eviction is moot for a checkpoint
  * deleted at gate end).
  *
  * `sbt "runMain graft.tools.StreamCfgProbe <gate> [pairs] [sfDir]"` */
object StreamCfgProbe {
  val CandidateConfs: Seq[(String, String)] = Seq(
    "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false",
    "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")

  def main(args: Array[String]): Unit = {
    val gate = if (args.nonEmpty) args(0) else "stream_join_views"
    val pairs = if (args.length > 1) args(1).toInt else 4
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-streamcfg")
    val fn = graft.SparkEntry.queries(gate)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup, discarded
    val (as, bs) = (1 to pairs).map { i =>
      CandidateConfs.foreach { case (k, _) => spark.conf.unset(k) }
      val a = run()
      CandidateConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      val b = run()
      println(f"PAIR $i%d baseline=$a%.2f s candidate=$b%.2f s")
      (a, b)
    }.unzip
    println(f"MEDIAN baseline=${as.sorted.apply(as.size / 2)}%.2f s " +
      f"candidate=${bs.sorted.apply(bs.size / 2)}%.2f s  (gate=$gate pairs=$pairs)")
    spark.stop()
  }
}
