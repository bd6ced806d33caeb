package graft.tools

import graft.Sessions

/** Phase-cost driver for the partition-scoped MERGE gates: runs
  * `incr_merge_partitioned` (or the entry named in args(0)) once
  * against args(1) (default sf0.1) with the dormant per-phase timer in
  * [[graft.operators.Upsert]] enabled via SPARK_GRAFT_MERGE_TIMING=1 —
  * the measurement behind SCALE.md's fixed-latency accounting of the
  * key-index maintenance. */
object MergeTiming {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-merge-timing")
    val entry = if (args.nonEmpty) args(0) else "incr_merge_partitioned"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(entry)(spark, dir).count()
    println(f"TOTAL $entry ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
