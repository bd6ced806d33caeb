package graft.tools

import graft.Sessions
import graft.operators.Upsert
import org.apache.spark.sql.functions._

/** Measures mergePartitionedPath's per-batch cost as the UNTOUCHED
  * partition count grows: a target with N date partitions (fixed rows
  * per partition) takes a one-partition batch. With the key-range
  * index the probe is pruned to candidates, so batch cost must stay
  * ~flat in N; without it (index deleted before each merge) the probe
  * scans all N partitions' key columns. Prints one line per (N, mode). */
object ProbeScaling {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-probe-scaling")
    import spark.implicits._
    val rowsPerPart = 200000
    for (nParts <- Seq(8, 8, 64, 512)) { // first 8 = JIT/shuffle warmup, discard
      val work = graft.sources.LocalFs.scratchDir("graft_probe_scaling")
      try {
        val path = s"$work/fact"
        val init = spark.range(0L, nParts.toLong * rowsPerPart)
          .select(col("id").as("k"),
            date_format(date_add(lit("2020-01-01").cast("date"),
              (col("id") / rowsPerPart).cast("int")), "yyyy-MM-dd").as("d"),
            (col("id") * 3).as("v"))
        Upsert.mergePartitionedPath(spark, path, init, Seq("k"), "d")
        // batch updates 50 keys inside partition 0's key range
        val batch = spark.range(0L, 50L).select(col("id").as("k"),
          lit("2020-01-01").as("d"), lit(-1L).as("v"))
        for (mode <- Seq("indexed", "noindex")) {
          if (mode == "noindex") {
            val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
            fs.delete(new org.apache.hadoop.fs.Path(path + "/_keyidx"), true)
          }
          val t0 = System.nanoTime()
          Upsert.mergePartitionedPath(spark, path, batch, Seq("k"), "d")
          println(f"PROBE parts=$nParts%4d mode=$mode%-8s merge=${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      } finally graft.sources.LocalFs.deleteRecursively(work)
    }
  }
}
